package graft.chunker

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-defined chunking (FastCDC-style gear hash) — the
  * dedup-friendly alternative to fixed/byte-budget chunking: boundaries
  * fall where the CONTENT's rolling hash hits a mask, not at fixed
  * offsets, so inserting or deleting a region re-chunks only its
  * neighborhood and every downstream chunk keeps its identity. For the
  * engine's chunk-sha delta sync this is the difference between
  * re-embedding O(1) chunks per edit and re-embedding every chunk after
  * the edit point (the byte-budget chunker shifts all downstream
  * boundaries). Properties gated by CdcChunkerSpec: lossless concat,
  * size bounds, and edit-locality measured against fixed-size chunking.
  *
  * Scale posture: chunking is row-local (`mapPartitions`, one linear
  * pass per document, O(1) state); only (doc_id, idx, sha, len) rows
  * leave the executor when hashing for dedup.
  */
object CdcChunker {

  /** Deterministic 256-entry gear table (xorshift from a fixed seed —
    * no RNG state, same table on every JVM). */
  private val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x
    }
  }

  /** Chunk `bytes` content-defined: a boundary closes a chunk at the
    * first position ≥ `minSize` where the gear hash masks to zero, or
    * forcibly at `maxSize`. `avgSize` must be a power of two (it becomes
    * the boundary mask, expected chunk length ≈ avgSize + minSize). */
  def boundaries(bytes: Array[Byte], avgSize: Int = 256, minSize: Int = 64,
      maxSize: Int = 1024): Seq[Int] = {
    require(avgSize > 0 && (avgSize & (avgSize - 1)) == 0, "avgSize must be a power of 2")
    require(minSize >= 1 && maxSize >= minSize)
    val mask = (avgSize - 1).toLong
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var start = 0
    while (start < bytes.length) {
      var h = 0L
      var i = start
      var cut = -1
      val hardEnd = math.min(start + maxSize, bytes.length)
      while (i < hardEnd && cut < 0) {
        h = (h << 1) + gear(bytes(i) & 0xff)
        if (i - start + 1 >= minSize && (h & mask) == 0L) cut = i + 1
        i += 1
      }
      val end = if (cut > 0) cut else hardEnd
      out += end
      start = end
    }
    out.toSeq
  }

  /** Split `text` (UTF-8 bytes) into content-defined chunks. Boundaries
    * are byte offsets; a boundary can split a multi-byte code point, so
    * chunks round-trip through bytes, not through String concatenation
    * of independent decodes — [[chunkBytes]] is the lossless form and
    * [[chunks]] is the convenience view for ASCII-safe corpora. */
  def chunkBytes(bytes: Array[Byte], avgSize: Int = 256, minSize: Int = 64,
      maxSize: Int = 1024): Seq[Array[Byte]] = {
    val ends = boundaries(bytes, avgSize, minSize, maxSize)
    var start = 0
    ends.map { e => val c = java.util.Arrays.copyOfRange(bytes, start, e); start = e; c }
  }

  def chunks(text: String, avgSize: Int = 256, minSize: Int = 64,
      maxSize: Int = 1024): Seq[String] =
    chunkBytes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      avgSize, minSize, maxSize)
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))

  /** Distributed form: one (doc_id, chunk_index, chunk_sha, chunk_len)
    * row per chunk — the identity table a chunk-level dedup or the
    * sync engine's delta join consumes. */
  def explodeChunks(documents: DataFrame, avgSize: Int = 256,
      minSize: Int = 64, maxSize: Int = 1024): Dataset[(Long, Int, String, Int)] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { case (id, text) =>
          val bytes = (if (text eq null) "" else text)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          chunkBytes(bytes, avgSize, minSize, maxSize).zipWithIndex.map {
            case (c, idx) =>
              val sha = md.digest(c).map("%02x".format(_)).mkString
              md.reset()
              (id, idx, sha, c.length)
          }
        }
      }
  }
}
