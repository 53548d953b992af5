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

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => img.setRGB(x, 0, x * 31))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("decodePartitioned reads TRUE dimensions from real PNG/JPEG bytes") {
    import spark.implicits._
    val rows = Seq(
      (1L, imageBytes("png", 37, 21)),
      (2L, imageBytes("jpeg", 64, 48)),
      (3L, "plain text payload, not an image".getBytes("UTF-8")))
    val docs = rows.toDF("doc_id", "text")
    val metas = Multimodal.decodePartitioned(docs).collect()
      .map(m => m.doc_id -> m).toMap
    assert((metas(1L).width, metas(1L).height, metas(1L).format) == ((37, 21, "png")))
    assert((metas(2L).width, metas(2L).height, metas(2L).format) == ((64, 48, "jpeg")))
    // non-image payloads keep the deterministic fallback binaryMeta mirrors
    val n = rows(2)._2.length
    assert((metas(3L).width, metas(3L).height) == ((n % 640, n % 480)))
  }

  test("decodeImage degrades to the fallback on a truncated image header") {
    val good = imageBytes("png", 10, 10)
    val truncated = good.take(12) // magic survives, header doesn't
    val (w, h, _) = Multimodal.decodeImage(truncated)
    assert((w, h) == ((truncated.length % 640, truncated.length % 480)))
  }
}
