package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Similarity, Temporal, TextAnalysis}

/** Degenerate-input discipline for the round-5 operators: empty
  * corpora, missing funnel steps, single-document inputs and too-short
  * texts must produce well-formed empty/zero results — never a throw —
  * because at 100 TB a partition-level edge case WILL occur.
  */
class Round5EdgeSpec extends SparkSpec {

  import spark.implicits._

  private val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val emptyEvents = Seq.empty[(Long, Long, String, String)]
    .toDF("event_id", "user_id", "t", "event_type")
    .select(col("event_id"), col("user_id"),
      to_timestamp(col("t")).as("ts"), col("event_type"))

  test("empty corpus: span/scoring/bpe operators return empty, not throw") {
    assert(Dedup.duplicateSpans(emptyDocs).count() == 0)
    assert(Dedup.duplicateSpansApply(emptyDocs).count() == 0)
    assert(TextAnalysis.bm25TopK(emptyDocs).count() == 0)
    assert(TextAnalysis.unigramSurprisal(emptyDocs).count() == 0)
    assert(TextAnalysis.tokenCardinality(
      emptyDocs.withColumn("lang", lit("en"))).count() == 0)
    assert(Bpe.bpeMerges(emptyDocs, nMerges = 5).count() == 0)
    assert(Bpe.bpeEncode(emptyDocs, Nil).count() == 0)
  }

  test("funnel with zero step-1 users: zero counts, conversion 0.0, no divide-by-zero") {
    // clicks and purchases exist but nobody signed up
    val ev = Seq(
      (1L, 1L, "2024-01-01 09:00:00", "click"),
      (2L, 1L, "2024-01-01 09:10:00", "purchase"))
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val rows = Temporal.funnel(ev).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 0L, 0L), rows.mkString)
    assert(rows.forall(_.getDouble(3) == 0.0), rows.mkString)
  }

  test("as-of and interval joins over an empty feed are empty") {
    assert(Temporal.asofAttribution(emptyEvents).count() == 0)
    assert(Temporal.intervalJoin(emptyEvents).count() == 0)
  }

  test("single-doc corpus: nothing is a cross-doc duplicate") {
    val one = Seq((1L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(one).collect().head
    assert(r.getLong(3) == 0 && r.getLong(5) == 0, r.toString)
    val cut = Dedup.duplicateSpansApply(one).collect().head
    assert(cut.getLong(2) == 0, cut.toString)
    assert(cut.getString(3) == (1 to 30).map(i => s"w$i").mkString(" "))
  }

  test("a present-but-EMPTY document row never kills the span operators") {
    // distinct from the empty-CORPUS case: sequence(1, 0) steps -1 in
    // Spark and element_at(ts, 0) throws — the review-found crash
    val mixed = Seq(
      (1L, (1 to 20).map(i => s"x$i").mkString(" ")),
      (2L, ""),
      (3L, "   ")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(mixed).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(spans(2L).getLong(1) == 0 && spans(2L).getDouble(6) == 0.0)
    val cut = Dedup.duplicateSpansApply(mixed).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(cut(2L).getString(3) == "" && cut(2L).getLong(2) == 0, cut(2L).toString)
    assert(cut(3L).getString(3) == "" && cut(3L).getLong(1) == 0, cut(3L).toString)
    assert(cut(1L).getString(3).startsWith("x1 "), cut(1L).toString)
  }

  test("bpe on a single repeated character still terminates and merges") {
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Bpe.bpeMerges(docs, nMerges = 10).collect()
    // vocab is one word: merges exhaust before 10 rounds, no infinite loop
    assert(merges.nonEmpty && merges.length <= 10)
    val enc = Bpe.bpeEncode(docs,
      merges.sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq)
      .collect().head
    assert(enc.getLong(1) == 2L) // two words
    assert(enc.getLong(2) >= 2L) // at least one subword each
  }

  test("pq operators on fewer vectors than centroids still encode") {
    val few = (0 until 4).map(i =>
      (i.toLong, Array.tabulate(64)(j => (i * 64 + j).toFloat))).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(few).collect()
    assert(enc.length == 4)
    val ivf = Similarity.ivfPqEncode(few).collect()
    assert(ivf.length == 4)
  }

  test("quantiles/stratified on an empty corpus are empty") {
    assert(TextAnalysis.tokenQuantiles(emptyDocs.withColumn("lang", lit("en")))
      .count() == 0)
    assert(TextAnalysis.stratifiedSample(
      emptyDocs.withColumn("lang", lit("en")), Map("en" -> 0.5)).count() == 0)
  }
}
