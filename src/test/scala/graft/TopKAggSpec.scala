package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Scored, TopK, TopKByScore}

/** The bounded top-k aggregate's contracts:
  *
  *   - row-for-row equal to the window-rank idiom it replaces
  *     (`row_number() OVER (... ORDER BY score DESC, id) <= k`),
  *     including tie groups;
  *   - result independent of input partitioning (the merge is
  *     associative + commutative — the property that makes map-side
  *     partial aggregation legal);
  *   - the physical plan IS two-phase (partial + final aggregate), so
  *     the shuffle carries k-row buffers, not the fact;
  *   - the buffer never exceeds k elements (the bounded-memory claim —
  *     unlike collect_list-then-slice, which buffers whole groups).
  *
  * The driver gate (q8b_topk_agg vs the q8 window oracle) then proves
  * the same equivalence under the DuckDB hash at sf0.01.
  */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  private def sample = {
    // scores with heavy ties (mod 7) so tie-breaking is exercised
    (1 to 500).map(i => (s"g${i % 5}", (i * 13 % 7).toLong, i.toLong))
      .toDF("g", "score", "id")
  }

  private def viaAgg(k: Int) = {
    val topk = TopK.byScore(k)
    sample.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.score").as("score"), col("col.id").as("id"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    sample.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("g", "score", "id", "rn")
  }

  test("equals the window-rank idiom row-for-row, ties included") {
    for (k <- Seq(1, 3, 10)) {
      val got = viaAgg(k).collect().toSet
      val want = viaWindow(k).collect().toSet
      assert(got == want, s"k=$k: agg ${got.size} rows vs window ${want.size}")
    }
  }

  test("result is independent of input partitioning") {
    val topk = TopK.byScore(3)
    def run(parts: Int) =
      sample.repartition(parts).groupBy("g")
        .agg(topk(col("score"), col("id")).as("top")).collect()
        .map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("physical plan is a two-phase aggregate — the shuffle carries k-row buffers") {
    val topk = TopK.byScore(3)
    val p = sample.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    val aggs = """\(\d+\) ObjectHashAggregate""".r.findAllIn(p).size
    assert(aggs == 2, s"expected partial+final ObjectHashAggregate, got $aggs\n$p")
    assert(p.contains("partial_topkbyscore"), s"no partial aggregation phase:\n$p")
  }

  test("k larger than the group returns the whole group, best-first") {
    val got = viaAgg(1000).where(col("g") === "g1")
      .orderBy("rn").collect()
    assert(got.length == 100)
    val scores = got.map(r => (r.getLong(1), r.getLong(2)))
    assert(scores.toSeq == scores.sortBy { case (s, i) => (-s, i) }.toSeq,
      "output not in (score DESC, id ASC) order")
  }

  test("the aggregator's buffer is bounded by k through reduce and merge") {
    val agg = TopKByScore(4)
    var buf = agg.zero
    (1 to 100).foreach(i => {
      buf = agg.reduce(buf, Scored(i % 11L, i.toLong))
      assert(buf.size <= 4, s"buffer overflowed: ${buf.size}")
    })
    val other = (1 to 50).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, Scored(i % 13L, 1000L + i)))
    val merged = agg.merge(buf, other)
    assert(merged.size <= 4)
    // merge equals brute force: top-4 of the union
    val union = (1 to 100).map(i => Scored(i % 11L, i.toLong)) ++
      (1 to 50).map(i => Scored(i % 13L, 1000L + i))
    val want = union.sortBy(s => (-s.score, s.id)).take(4)
    assert(merged.toSeq == want.toSeq)
  }
}
