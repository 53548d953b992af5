package graft

import org.apache.spark.sql.functions._

import graft.operators.TableDiff

/** Snapshot-diff contracts: exact delta detection, the null-sentinel /
  * separator safety of the content hash, and the scale property that
  * payloads never cross the shuffle — each side reduces to (key, hash)
  * in the scan stage. */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private val cols = Seq("text", "lang")

  private def df(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "lang")

  test("identical snapshots diff to empty; keepUnchanged reports every key unchanged") {
    val a = df((1L, "x", "en"), (2L, "y", "de"))
    assert(TableDiff.diff(a, a, "id", cols).count() == 0)
    val full = TableDiff.diff(a, a, "id", cols, keepUnchanged = true).collect()
    assert(full.length == 2 && full.forall(_.getString(1) == "unchanged"))
  }

  test("planted add/remove/change are each detected exactly once, nothing else") {
    val before = df((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
    val after = df((1L, "a", "en"), (3L, "c2", "de"), (4L, "d", "fr"))
    val got = TableDiff.diff(before, after, "id", cols).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "removed", 3L -> "changed", 4L -> "added"))

    val summary = TableDiff.diffSummary(before, after, "id", cols).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("hash safety: null vs empty string differ; column-boundary shifts differ") {
    // null vs "" must hash differently (the chr(0) sentinel's job)
    val n1 = Seq((1L, null.asInstanceOf[String], "en")).toDF("id", "text", "lang")
    val n2 = df((1L, "", "en"))
    assert(TableDiff.diff(n1, n2, "id", cols).count() == 1)

    // ("ab","c") vs ("a","bc") must differ (the chr(1) separator's job)
    val s1 = df((1L, "ab", "c"))
    val s2 = df((1L, "a", "bc"))
    assert(TableDiff.diff(s1, s2, "id", cols).count() == 1)

    // and a genuinely identical row with a null hashes stably
    assert(TableDiff.diff(n1, n1, "id", cols).count() == 0)
  }

  test("payloads never shuffle: every exchange carries only key + hash columns") {
    val before = df((1L, "long payload " * 100, "en"))
    val after = df((1L, "other payload " * 100, "en"))
    // exchanges are inserted by EnsureRequirements — inspect the
    // prepared (formatted) plan, whose per-node Input lists name the
    // attributes each exchange actually moves
    val p = TableDiff.diff(before, after, "id", cols).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs =
      """\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]""".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, s"expected a shuffle for the full-outer join\n$p")
    exchangeInputs.foreach { in =>
      val names = in.split(",").map(s => s.trim.takeWhile(_ != '#')).toSet
      assert(names.subsetOf(Set("id", "before_hash", "after_hash")),
        s"payload columns crossed an exchange: $names\n$p")
    }
  }

  test("the driver query's variant derivation hits all three statuses at spec SF") {
    val docs = catalog.Catalog.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val diff = SparkEntry.queries("dt_diff")(spark, sfDir)
      .groupBy("status").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("added", "removed", "changed").subsetOf(diff.keySet),
      s"variant too weak at this SF: $diff")
    // removed = docs with doc_id % 17 == 0
    val removed = docs.where(col("doc_id") % 17 === 0).count()
    assert(diff("removed") == removed)
    // added = docs with doc_id % 19 == 0 (re-keyed +1e6, never collides)
    val added = docs.where(col("doc_id") % 19 === 0).count()
    assert(diff("added") == added)
  }
}
