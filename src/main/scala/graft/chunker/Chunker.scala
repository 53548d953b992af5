package graft.chunker

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Chunk

/** Sentence-aware, byte-budgeted text chunker with word-safe overlap —
  * the reference's intra-string "windowing" operator
  * (`includes/class-chunker.php:24-103`, SURVEY §2.8).
  *
  * Semantics replicated:
  *  1. normalize: CRLF/CR→LF, tab→space, 3+ newlines→"\n\n", per-line
  *     rtrim, global trim (`class-chunker.php:109-123`);
  *  2. units = sentences (split keeping terminal `[.!?…。！？]`, Unicode)
  *     + explicit paragraph breaks (`:129-176`);
  *  3. greedy packing into a BYTE budget `targetTokens * avgCharsPerTok`
  *     (PHP `strlen` counts bytes — SURVEY §1.3), flush on overflow and
  *     carry a word-safe overlap tail of ≤ `overlapTokens * avgCharsPerTok`
  *     bytes (backtrack to previous whitespace, ltrim) (`:44-58, 247-267`);
  *  4. oversize units word-split (`:197-229`); oversize words hard-split at
  *     UTF-8 character boundaries (`:234-242`);
  *  5. output `{index, text, chars, approx_tokens = ceil(bytes/4)}`
  *     (`:92-101`).
  *
  * Pure function of (text, params) → deterministic (SURVEY §1.3). At scale
  * it runs as a UDF inside the row pipeline — no shuffle, no state; the
  * array result is immediately `posexplode`d so chunk rows pipeline into
  * downstream stages.
  */
object Chunker {

  private def bytes(s: String): Int = s.getBytes(UTF_8).length

  /** Stage 1: whitespace normalization (`class-chunker.php:109-123`). */
  def normalizeText(text: String): String = {
    val lf = text.replace("\r\n", "\n").replace("\r", "\n").replace("\t", " ")
    val collapsed = lf.replaceAll("\n{3,}", "\n\n")
    collapsed.split("\n", -1).map(_.replaceAll("\\s+$", "")).mkString("\n").trim
  }

  /** Stage 2: decompose into units — paragraphs then sentences, keeping
    * terminal punctuation (`class-chunker.php:129-176`). */
  def units(text: String): Seq[String] = {
    val paras = text.split("\n\n+").toSeq.map(_.trim).filter(_.nonEmpty)
    paras.flatMap { p =>
      // split AFTER sentence-ending punctuation followed by whitespace
      p.split("(?<=[.!?…。！？])\\s+").toSeq.map(_.trim).filter(_.nonEmpty)
    }
  }

  /** Word-split an oversize unit into ≤budget byte pieces; words larger
    * than the budget are hard-split at character boundaries
    * (`class-chunker.php:197-242`). */
  private def splitOversize(unit: String, budget: Int): Seq[String] = {
    val words = unit.split("\\s+").toSeq.filter(_.nonEmpty)
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    for (w0 <- words) {
      val pieces =
        if (bytes(w0) <= budget) Seq(w0)
        else { // hard-split at char boundaries within the byte budget
          val ps = ArrayBuffer.empty[String]
          val it = new StringBuilder
          for (ch <- w0) {
            if (bytes(it.toString + ch) > budget && it.nonEmpty) {
              ps += it.toString; it.clear()
            }
            it.append(ch)
          }
          if (it.nonEmpty) ps += it.toString
          ps.toSeq
        }
      for (p <- pieces) {
        val candidate = if (cur.isEmpty) p else cur.toString + " " + p
        if (bytes(candidate) > budget && cur.nonEmpty) { flush(); cur.append(p) }
        else { cur.clear(); cur.append(candidate) }
      }
    }
    flush()
    out.toSeq
  }

  /** Word-safe overlap tail: last ≤ maxBytes bytes of `text`, backtracked
    * to the previous whitespace, left-trimmed (`class-chunker.php:247-267`). */
  def overlapTail(text: String, maxBytes: Int): String = {
    if (maxBytes <= 0 || text.isEmpty) return ""
    if (bytes(text) <= maxBytes) return text
    // find the char index where the tail starts (last maxBytes bytes)
    var i = text.length
    var b = 0
    while (i > 0 && b + bytes(text.substring(i - 1, i)) <= maxBytes) {
      i -= 1; b += bytes(text.substring(i, i + 1))
    }
    // backtrack forward to the next whitespace so we don't cut a word
    val tail = text.substring(i)
    val ws = tail.indexWhere(_.isWhitespace)
    if (ws < 0) "" else tail.substring(ws).replaceAll("^\\s+", "")
  }

  /** The chunker (`class-chunker.php:24-103`). */
  def chunkText(
      text: String,
      targetTokens: Int = 800,
      overlapTokens: Int = 100,
      avgCharsPerTok: Double = 4.0): Seq[Chunk] = {
    val budget = math.max(1, (targetTokens * avgCharsPerTok).toInt)
    val overlapBudget = math.max(0, (overlapTokens * avgCharsPerTok).toInt)
    val norm = normalizeText(text)
    if (norm.isEmpty) return Nil

    val us = units(norm).flatMap { u =>
      if (bytes(u) <= budget) Seq(u) else splitOversize(u, budget)
    }

    val texts = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) {
      texts += cur.toString
      val tail = overlapTail(cur.toString, overlapBudget)
      cur.clear()
      if (tail.nonEmpty) cur.append(tail)
    }
    for (u <- us) {
      val candidate = if (cur.isEmpty) u else cur.toString + " " + u
      if (bytes(candidate) > budget && cur.nonEmpty) {
        flush()
        val cand2 = if (cur.isEmpty) u else cur.toString + " " + u
        if (bytes(cand2) > budget) { cur.clear(); cur.append(u) }
        else { cur.clear(); cur.append(cand2) }
      } else { cur.clear(); cur.append(candidate) }
    }
    if (cur.nonEmpty) texts += cur.toString

    texts.zipWithIndex.map { case (t, i) =>
      val n = bytes(t)
      Chunk(i, t, n, math.ceil(n / avgCharsPerTok).toInt)
    }.toSeq
  }

  /** Spark-facing UDF: `ArrayType(StructType(index,text,chars,approx_tokens))`.
    * Consumed with `posexplode`/`inline` so chunk rows stream — the array is
    * never materialized beyond one row's chunks. */
  val chunkSchema: StructType = StructType(Seq(
    StructField("index", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("chars", IntegerType, nullable = false),
    StructField("approx_tokens", IntegerType, nullable = false)))

  def chunkUdf(targetTokens: Int, overlapTokens: Int) =
    udf((s: String) =>
      if (s == null) Seq.empty[Chunk]
      else chunkText(s, targetTokens, overlapTokens))

  /** Explode a text column into one row per chunk (UDF + posexplode path —
    * materializes the chunk array per row; fine at catalog scale). */
  def explodeChunks(df: DataFrame, textCol: Column, idCols: Seq[Column],
      targetTokens: Int = 800, overlapTokens: Int = 100): DataFrame =
    df.select(idCols :+ explode(chunkUdf(targetTokens, overlapTokens)(textCol)).as("chunk"): _*)
      .select(idCols ++ Seq(
        col("chunk.index").as("chunk_index"),
        col("chunk.text").as("chunk_text"),
        col("chunk.chars").as("chars"),
        col("chunk.approxTokens").as("approx_tokens")): _*)

  /** Generator path (the 100 TB shape, SURVEY §7.6.8): chunks stream out
    * of a `Generate` node via `graft.expressions.ChunkGenerator` — no
    * per-document array materialization. Same output schema as
    * [[explodeChunks]]. */
  def explodeChunksGen(df: DataFrame, textCol: Column, idCols: Seq[Column],
      targetTokens: Int = 800, overlapTokens: Int = 100): DataFrame = {
    graft.expressions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.select(idCols :+ call_function("chunk_gen",
      textCol, lit(targetTokens), lit(overlapTokens))
      .as(Seq("chunk_index", "chunk_text", "chars", "approx_tokens")): _*)
  }
}
