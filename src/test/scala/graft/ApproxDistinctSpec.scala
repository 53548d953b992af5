package graft

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** The approx-distinct swap points are CODE, not comments: the two
  * gated queries carrying a COUNT(DISTINCT) two-phase shuffle
  * (q16_part_suppliers, j10_cohort) each expose an `approxDistinct`
  * parameter that swaps in `approx_count_distinct` (HLL++, fixed-size
  * mergeable sketch — the 100 TB shuffle shape), and this spec bounds
  * the estimate against the exact answer at sf0.1, group by group.
  * Run at sf0.1 deliberately: sketch error is what the swap trades,
  * so the bound is measured at the largest local scale, not the spec
  * default. */
class ApproxDistinctSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  /** Per-group relative error of approx vs exact, keyed rows matched
    * 1:1; returns (worst relative error, n groups). */
  private def worstErr(exact: Map[Seq[Any], Long],
      approx: Map[Seq[Any], Long]): (Double, Int) = {
    assert(exact.keySet == approx.keySet,
      s"group sets diverged: ${exact.keySet.size} vs ${approx.keySet.size}")
    val errs = exact.map { case (k, e) =>
      math.abs(approx(k) - e).toDouble / math.max(e, 1L)
    }
    (errs.max, errs.size)
  }

  test("q16: approx_count_distinct within 5% of exact per (brand, size) at sf0.1") {
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Seq[Any](r.get(0), r.get(1)) -> r.getLong(2)).toMap
    val exact = toMap(SparkEntry.q16PartSuppliers(spark, sf01))
    val approx = toMap(SparkEntry.q16PartSuppliers(spark, sf01,
      approxDistinct = true))
    val (worst, n) = worstErr(exact, approx)
    assert(n > 0, "no groups — bound is vacuous")
    assert(worst <= 0.05, f"worst per-group error $worst%.4f > 5%% over $n groups")
  }

  test("j10 cohort: approx n_active within 5% of exact per (cohort, offset) at sf0.1") {
    val events = catalog.Catalog.events(spark, sf01)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => Seq[Any](r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = toMap(Temporal.cohortRetention(events))
    val approx = toMap(Temporal.cohortRetention(events, approxDistinct = true))
    val (worst, n) = worstErr(exact, approx)
    assert(n > 0, "no cohorts — bound is vacuous")
    assert(worst <= 0.05, f"worst per-group error $worst%.4f > 5%% over $n groups")
    // cohort sizes are exact counts and must be identical in both forms
    val sizesE = Temporal.cohortRetention(events).select("cohort_week", "cohort_users")
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizesA = Temporal.cohortRetention(events, approxDistinct = true)
      .select("cohort_week", "cohort_users")
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizesE == sizesA, "cohort_users must stay exact under the swap")
  }
}
