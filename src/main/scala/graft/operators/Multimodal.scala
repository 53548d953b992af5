package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata. Image decode is REAL — `javax.imageio` ships in the
  * JDK, so PNG/JPEG/GIF/BMP headers are parsed for true dimensions
  * ([[decodeImage]]); only non-image payloads (video/audio, whose codecs
  * the JRE genuinely lacks) fall back to the clearly-marked deterministic
  * fake ([[fakeDecode]]).
  *
  * Scale posture (100 TB): binary payloads never shuffle — metadata is
  * projected out in the scan stage and all downstream ops run on the
  * narrow metadata columns. Decode runs in `mapPartitions` so decoder
  * init amortizes per partition, the Scala equivalent of the
  * `mapInPandas` batch shape; dimension reads are header-only
  * (`ImageReader.getWidth`), never a full pixel decode.
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

  /** Magic-byte sniff for the formats the JDK's ImageIO can read. The
    * PNG/JPEG magics contain non-ASCII bytes, so text can't collide; the
    * BMP/GIF magics are printable ASCII ("BM", "GIF89a"), so those checks
    * additionally require a CONTROL byte right after the magic — the
    * header region of a real BMP/GIF always has one (dimension/flag bytes;
    * a GIF would need both dimensions ≥ 0x2000 px AND printable flag,
    * background and aspect bytes to evade it), while a text payload that
    * merely STARTS with "GIF89a …" is all-printable there and falls
    * through to the non-image fallback. */
  private def sniffImageFormat(bytes: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int) = bytes.length > i && (bytes(i) & 0xff) == v
    // a byte no plain-text document contains (control chars minus \t\n\r)
    def ctl(i: Int) = bytes.length > i && {
      val b = bytes(i) & 0xff
      b < 0x09 || (b > 0x0d && b < 0x20)
    }
    if (at(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G')) Some("png")
    else if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) Some("jpeg")
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8') &&
      (at(4, '7') || at(4, '9')) && at(5, 'a') &&
      (6 to 12).exists(ctl)) Some("gif")
    else if (at(0, 'B') && at(1, 'M') &&
      at(6, 0) && at(7, 0) && at(8, 0) && at(9, 0)) Some("bmp")
    else None
  }

  /** STUB decode for NON-image payloads only (video/audio — no codecs in
    * the JRE): deterministic fake keeps the pipeline testable end-to-end. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 640, n % 480) // ??? real av-codec goes here
  }

  /** Real image decode via JDK-builtin `javax.imageio`: header-only
    * dimension read (no pixel decode) for PNG/JPEG/GIF/BMP; anything the
    * sniffer doesn't recognize falls back to [[fakeDecode]] with the
    * length-derived pseudo-format (so non-image payloads keep the exact
    * behavior [[binaryMeta]]'s pure-expression oracle mirrors). */
  def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    def fallback = {
      val (w, h) = fakeDecode(bytes)
      val fmt = (bytes.length % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
      }
      (w, h, fmt)
    }
    sniffImageFormat(bytes) match {
      case Some(fmt) =>
        try {
          val in = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(in)
            if (readers.hasNext) {
              val r = readers.next()
              try { r.setInput(in, true); (r.getWidth(0), r.getHeight(0), fmt) }
              finally r.dispose()
            } else fallback
          } finally in.close()
        } catch {
          // a truncated/corrupt header must degrade to the fake, not fail
          // a 100 TB job on one bad asset
          case _: java.io.IOException | _: IllegalArgumentException => fallback
        }
      case None => fallback
    }
  }

  /** The batched per-partition decode path (the `mapInPandas` shape):
    * binary in, typed metadata out, decoder init amortized per partition.
    * Real image payloads get true ImageIO dimensions; non-image payloads
    * agree exactly with [[binaryMeta]] (spec-asserted). */
  def decodePartitioned(documents: DataFrame): Dataset[MediaMeta] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id").cast("long"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init (MessageDigest; ImageIO reader
        // registry is JVM-global and warms once)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (w, h, fmt) = decodeImage(bytes)
          val sha = md.digest(bytes).map("%02x".format(_)).mkString
          md.reset()
          MediaMeta(id, bytes.length.toLong, sha, w, h, fmt)
        }
      }
  }
}
