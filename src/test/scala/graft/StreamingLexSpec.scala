package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.LexIndex
import graft.streaming.StreamingLex

/** Streaming index maintenance: streamed generations answer exactly
  * like a from-scratch rebuild over the union, and a replayed batch
  * (same stream batch id after a lost checkpoint) is refused by the
  * version guard — never double-counted. */
class StreamingLexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = catalog.Catalog.documents(spark, sfDir)

  private def mkStream() = {
    implicit val ctx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    (input, input.toDF().select(col("_1").as("doc_id"), col("_2").as("text")))
  }

  private def rows(root: String, terms: Seq[String]) =
    LexIndex.search(spark, root, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("streamed batches answer exactly like a rebuild over the union") {
    val root = Files.createTempDirectory("slex_root").toString
    val ckpt = Files.createTempDirectory("slex_ckpt").toString
    val seed = docs.where(col("doc_id") % 3 === 0).select("doc_id", "text")
    LexIndex.build(spark, seed, root)

    val later = docs.where(col("doc_id") % 3 =!= 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val (in, stream) = mkStream()
    in.addData(later.take(later.length / 2).toSeq)
    in.addData(later.drop(later.length / 2).toSeq)
    StreamingLex.start(stream, root, ckpt).awaitTermination()

    val full = Files.createTempDirectory("slex_full").toString
    LexIndex.build(spark, docs.select("doc_id", "text"), full)
    val terms = Seq("vector", "merge", "spark")
    assert(rows(root, terms) == rows(full, terms),
      "streamed index diverged from the rebuild")
  }

  test("a resumed checkpoint anchors to the persisted base version — restart keeps ingesting") {
    // round-9 advisory: with a RESUMED checkpoint, batch ids continue
    // where they left off, so re-deriving the base from the CURRENT
    // committed version overshoots the contiguity check and the restart
    // dies. The base must come from the checkpoint's recorded anchor.
    val root = Files.createTempDirectory("slex3_root").toString
    val ckpt = Files.createTempDirectory("slex3_ckpt").toString
    val srcDir = Files.createTempDirectory("slex3_src").toString
    LexIndex.build(spark, docs.where(col("doc_id") % 3 === 0)
      .select("doc_id", "text"), root)

    docs.where(col("doc_id") % 3 === 1).select("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def pass(): Unit = StreamingLex.start(
      spark.readStream.schema(schema).parquet(srcDir), root, ckpt)
      .awaitTermination()
    pass() // first start: anchors and persists the base

    docs.where(col("doc_id") % 3 === 2).select("doc_id", "text")
      .write.mode("append").parquet(srcDir)
    pass() // RESUME: same checkpoint, continuing batch ids

    val full = Files.createTempDirectory("slex3_full").toString
    LexIndex.build(spark, docs.select("doc_id", "text"), full)
    val terms = Seq("vector", "merge", "spark")
    assert(rows(root, terms) == rows(full, terms),
      "resumed maintenance diverged from the rebuild")
  }

  test("a replayed stream batch is refused by the version guard") {
    val root = Files.createTempDirectory("slex2_root").toString
    LexIndex.build(spark, docs.where(col("doc_id") < 100)
      .select("doc_id", "text"), root)
    val base = graft.streaming.StateCommit.currentVersion(spark, root).get

    val batch = docs.where(col("doc_id") >= 100 && col("doc_id") < 150)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq

    val ck1 = Files.createTempDirectory("slex2_ck1").toString
    val (in1, s1) = mkStream()
    in1.addData(batch)
    StreamingLex.start(s1, root, ck1, baseVersion = Some(base)).awaitTermination()
    val before = rows(root, Seq("vector", "merge"))

    // lost checkpoint => the same data re-delivers as batch 0 again
    val ck2 = Files.createTempDirectory("slex2_ck2").toString
    val (in2, s2) = mkStream()
    in2.addData(batch)
    StreamingLex.start(s2, root, ck2, baseVersion = Some(base)).awaitTermination()
    assert(rows(root, Seq("vector", "merge")) == before,
      "replayed batch double-counted")
  }
}
