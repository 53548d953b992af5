package graft

import org.apache.spark.sql.functions._

import graft.chunker.Chunker

/** The Generator chunking path must produce exactly the rows of the
  * UDF+posexplode path (same schema, same chunks), and the plan must
  * contain a Generate node (the streaming shape, not an array explode).
  */
class ChunkGeneratorSpec extends SparkSpec {

  test("generator path equals UDF+posexplode path on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    val viaUdf = Chunker.explodeChunks(docs, col("text"), Seq(col("doc_id")), 60, 10)
    val viaGen = Chunker.explodeChunksGen(docs, col("text"), Seq(col("doc_id")), 60, 10)
    assert(viaUdf.schema.fieldNames.toSeq == viaGen.schema.fieldNames.toSeq)
    val a = viaUdf.orderBy("doc_id", "chunk_index").collect().map(_.toSeq)
    val b = viaGen.orderBy("doc_id", "chunk_index").collect().map(_.toSeq)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("generator plants a Generate node in the plan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(5)
    val plan = Chunker.explodeChunksGen(docs, col("text"), Seq(col("doc_id")))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate"), plan)
  }
}
