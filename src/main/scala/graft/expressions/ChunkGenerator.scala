package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.chunker.Chunker

/** Generator form of the chunker (SURVEY §2.12/§7.6.8): emits one output
  * row per chunk directly instead of materializing an array-of-struct per
  * document and exploding it — at 100 TB the UDF+posexplode path holds
  * every chunk of a document in memory at once inside the row, while a
  * Generator streams them. Catalyst plants this in a `Generate` node via
  * the ExtractGenerators rule when the registered function is used in a
  * projection.
  *
  * `size`/`overlap` are bound at build time from literal arguments
  * (chunking config is per-job, not per-row — matching the reference's
  * options blob, `includes/class-options.php:63-73`).
  */
case class ChunkGenerator(child: Expression, size: Int, overlap: Int)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false),
    StructField("chars", IntegerType, nullable = false),
    StructField("approx_tokens", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else Chunker.chunkText(t.toString, size, overlap).map { c =>
      InternalRow(c.index, UTF8String.fromString(c.text), c.chars, c.approxTokens)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkGenerator =
    copy(child = newChildren.head)
}
