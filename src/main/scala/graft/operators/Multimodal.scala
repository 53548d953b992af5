package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata. The container has no image/audio codecs, so the decode
  * step is a clearly-marked deterministic fake ([[fakeDecode]]) — the
  * Spark-side plumbing (binary schema, batched per-partition processing,
  * metadata extraction) is real and tested.
  *
  * Scale posture (100 TB): binary payloads never shuffle — metadata is
  * projected out in the scan stage and all downstream ops run on the
  * narrow metadata columns. Decode runs in `mapPartitions` so a real
  * decoder would amortize model/codec init per partition, the Scala
  * equivalent of the `mapInPandas` batch shape.
  */
object Multimodal {

  /** Typed metadata of a decoded media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, sha: String,
      width: Int, height: Int, format: String)

  /** Column-level metadata extraction over a binary column — pure
    * expressions, oracle-checkable. */
  def binaryMeta(documents: DataFrame): DataFrame = {
    val bin = col("text").cast("binary")
    val nBytes = octet_length(col("text")).cast("bigint")
    documents.select(
      col("doc_id"),
      nBytes.as("n_bytes"),
      sha2(bin, 256).as("sha"),
      (nBytes % 640).cast("int").as("width"),
      (nBytes % 480).cast("int").as("height"),
      when(nBytes % 3 === 0, "png").when(nBytes % 3 === 1, "jpeg")
        .otherwise("webp").as("format"))
      .orderBy("doc_id")
  }

  /** Video frame-sampling plan over a binary column: derive the stream's
    * frame count from its metadata (here: bytes/1000 + 1 at a nominal
    * 24 fps — a real container parser slots in at the same column), pick
    * an even sampling stride targeting ≤ `maxFrames` samples, and emit
    * one row per sampled frame with its index and timestamp. This is the
    * PLAN side of frame extraction — the rows feed the batched decode
    * path ([[decodePartitioned]]) which would seek those offsets.
    *
    * Scale posture: pure expressions + one `posexplode` whose fan-out is
    * capped at `maxFrames` rows per asset; binary payloads stay in place. */
  def frameSamplePlan(documents: DataFrame, maxFrames: Int = 8,
      fps: Double = 24.0): DataFrame =
    documents
      .select(col("doc_id"),
        expr("CAST(octet_length(text) AS BIGINT) DIV 1000 + 1").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        greatest(lit(1L), expr(s"n_frames DIV $maxFrames")).as("stride"))
      .select(col("doc_id"), col("n_frames"), col("stride"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, col("stride"))))
      .where(col("pos") < maxFrames)
      .select(col("doc_id"), col("n_frames"),
        col("pos").cast("int").as("sample_idx"),
        col("col").as("frame_idx"),
        round(col("col") / lit(fps), 3).as("ts_sec"))
      .orderBy("doc_id", "sample_idx")

  /** STUB decode: a real implementation would decode image bytes here
    * (libs not in this container). Deterministic fake keeps the pipeline
    * testable end-to-end. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 640, n % 480) // ??? real decoder goes here
  }

  /** The batched per-partition decode path (the `mapInPandas` shape):
    * binary in, typed metadata out, codec init amortized per partition. */
  def decodePartitioned(documents: DataFrame): Dataset[MediaMeta] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init would happen here
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (w, h) = fakeDecode(bytes)
          val sha = md.digest(bytes).map("%02x".format(_)).mkString
          md.reset()
          val fmt = (bytes.length % 3) match {
            case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
          }
          MediaMeta(id, bytes.length.toLong, sha, w, h, fmt)
        }
      }
  }
}
