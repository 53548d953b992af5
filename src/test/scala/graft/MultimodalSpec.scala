package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The batched per-partition decode path must agree with the column-level
  * metadata extraction (same sha/width/height/format per doc) — i.e. the
  * mapPartitions plumbing is semantically identical to the pure-expression
  * variant the oracle checks.
  */
class MultimodalSpec extends SparkSpec {

  test("decodePartitioned agrees with binaryMeta") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val viaExpr = Multimodal.binaryMeta(docs)
      .select("doc_id", "n_bytes", "sha", "width", "height", "format")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val viaPart = Multimodal.decodePartitioned(docs).collect()
    assert(viaPart.length == viaExpr.size && viaPart.nonEmpty)
    viaPart.foreach { m =>
      val e = viaExpr(m.doc_id)
      assert(Seq(m.n_bytes, m.sha, m.width, m.height, m.format) == e,
        s"doc ${m.doc_id}: $m vs $e")
    }
  }
}
