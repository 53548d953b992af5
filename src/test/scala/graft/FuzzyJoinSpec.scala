package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Blocked Levenshtein-join contracts: exact within-block recall,
  * the documented blocking miss, best-match tie-breaking, and the plan
  * shape (broadcast probe, no cartesian — the master never shuffles). */
class FuzzyJoinSpec extends SparkSpec {

  import spark.implicits._

  private def master = Seq(
    (1L, "alpha cluster node"),
    (2L, "alpha cluster mode"), // dist 1 from key 1
    (3L, "alpha crust node"),   // dist 2+ from key 1
    (4L, "beta cluster node"),
    (5L, "alph different tail entirely")
  ).toDF("k", "name")

  test("a corrupted copy resolves to its original; best match breaks ties deterministically") {
    // drop one mid-string char from key 1's name → dist 1 to key 1,
    // dist 2 to key 2 (both within maxDist, same block "alph")
    val probe = Seq((100L, "alpha clustr node")).toDF("k", "name")
    val got = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((100L, 1L, 1)), s"original not recovered: $got")

    val best = FuzzyJoin.resolveBest(master, probe, "k", "name", 4, 2).collect()
    assert(best.length == 1 && best.head.getLong(1) == 1L &&
      best.head.getInt(2) == 1)

    // tie in distance → smaller master key wins
    val probeTie = Seq((200L, "alpha cluster Xode")).toDF("k", "name")
    val bestTie = FuzzyJoin.resolveBest(master, probeTie, "k", "name", 4, 2)
      .collect()
    assert(bestTie.head.getLong(1) == 1L, // dist 1 to both keys 1 and 2
      s"tie not broken by smallest key: ${bestTie.mkString}")
  }

  test("within a shared block, results equal the unblocked brute force") {
    val probe = Seq((100L, "alpha clustr node"), (101L, "alpha cluster")).toDF("k", "name")
    val blocked = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = probe.select(col("k").as("probe_key"), col("name").as("p"))
      .crossJoin(master.select(col("k").as("match_key"), col("name").as("m")))
      .withColumn("dist", levenshtein(col("p"), col("m")))
      .where(col("dist") <= 2 &&
        substring(col("p"), 1, 4) === substring(col("m"), 1, 4))
      .select("probe_key", "match_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == brute)
  }

  test("the blocking contract: an edit inside the prefix is missed by construction") {
    // "Alpha..." vs "alpha...": dist 1, but block "Alph" != "alph"
    val probe = Seq((300L, "Alpha cluster node")).toDF("k", "name")
    assert(FuzzyJoin.resolve(master, probe, "k", "name", 4, 2).count() == 0)
    // with blocking disabled down to 0-char... prefixLen=1 still splits
    // A/a; a caller who needs case-robust blocking lowercases first
    val fixed = FuzzyJoin.resolve(master,
      probe.withColumn("name", lower(col("name"))), "k", "name", 4, 2)
    assert(fixed.where(col("match_key") === 1L).count() == 1)
  }

  test("dualBlock: an in-prefix edit resolves via the suffix pass; no pair is emitted twice") {
    // "Alpha..." vs "alpha...": dist 1, edit at char 1 — the single
    // prefix block misses it by construction (pinned above); the dual
    // form recovers it through the untouched suffix
    val probe = Seq((300L, "Alpha cluster node")).toDF("k", "name")
    val dual = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2,
      dualBlock = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(dual.contains((300L, 1L, 1)), s"suffix pass missed: ${dual.mkString}")

    // a pair equal in BOTH blocks (identical text) must appear exactly
    // once — the suffix pass's prefix-unequal residual keeps the union
    // disjoint
    val probeEq = Seq((400L, "alpha cluster node")).toDF("k", "name")
    val eq = FuzzyJoin.resolve(master, probeEq, "k", "name", 4, 2,
      dualBlock = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(eq.count(_ == ((400L, 1L, 0))) == 1, s"duplicate pair: ${eq.mkString}")
  }

  test("dualBlock equals the unblocked brute force under the OR-block predicate") {
    val probe = Seq((100L, "alpha clustr node"), (300L, "Alpha cluster node"),
      (101L, "alpha cluster")).toDF("k", "name")
    val dual = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2,
      dualBlock = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = probe.select(col("k").as("probe_key"), col("name").as("p"))
      .crossJoin(master.select(col("k").as("match_key"), col("name").as("m")))
      .withColumn("dist", levenshtein(col("p"), col("m")))
      .where(col("dist") <= 2 &&
        (substring(col("p"), 1, 4) === substring(col("m"), 1, 4) ||
          substring(reverse(col("p")), 1, 4) === substring(reverse(col("m")), 1, 4)))
      .select("probe_key", "match_key", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(dual == brute)
  }

  test("plan: dualBlock still never exchanges the master — two broadcast passes, no cartesian") {
    val probe = Seq((100L, "alpha clustr node")).toDF("k", "name")
    val p = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2, dualBlock = true)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // tree lines only ("BroadcastHashJoin Inner ..."); the formatted
    // detail section repeats each node name without the join type
    assert("BroadcastHashJoin Inner".r.findAllIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("verifyDistinctTexts: identical result multiset on a duplicated corpus, keys fully re-expanded") {
    // duplicated texts under distinct keys — the corpus shape whose
    // per-row-pair verification goes quadratic (the round-10 sf1 curve
    // caught dd_fuzzy at 100x); the distinct path must be a pure
    // execution-strategy swap
    val dupMaster = master.unionByName(
      master.withColumn("k", col("k") + 100)) // every text twice
    val probe = Seq((100L, "alpha clustr node"), (300L, "Alpha cluster node"),
      (101L, "alpha cluster"), (102L, "alpha clustr node")).toDF("k", "name")
    def rows(distinctTexts: Boolean) =
      FuzzyJoin.resolve(dupMaster, probe, "k", "name", 4, 2,
        dualBlock = true, verifyDistinctTexts = distinctTexts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sorted.toSeq
    val default = rows(false)
    val viaDistinct = rows(true)
    assert(default == viaDistinct,
      s"distinct-text path diverged: ${default.size} vs ${viaDistinct.size}")
    // duplicate master keys both present (re-expansion is complete) and
    // duplicate probe texts both resolve
    assert(default.exists(_._2 > 100) && default.exists(_._2 <= 100))
    assert(viaDistinct.exists(_._1 == 102L))
    // and best-match agrees too
    val bestA = FuzzyJoin.resolveBest(dupMaster, probe, "k", "name", 4, 2,
      dualBlock = true).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bestB = FuzzyJoin.resolveBest(dupMaster, probe, "k", "name", 4, 2,
      dualBlock = true, verifyDistinctTexts = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(bestA == bestB)
  }

  test("plan: probe broadcasts, no cartesian, master side never exchanges") {
    val probe = Seq((100L, "alpha clustr node")).toDF("k", "name")
    val p = FuzzyJoin.resolve(master, probe, "k", "name", 4, 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("resolveBest distinct-text joins are size-gated, not hint-forced (round-12 review)") {
    // mKey is one row per distinct MASTER text and bestPerText one per
    // distinct probe text — on a mostly-distinct corpus both are
    // master/probe-sized, so a broadcast HINT would force a driver OOM
    // at scale. Unhinted, the planner's size estimate decides: past the
    // threshold the plan must degrade to shuffle joins, and the rows
    // must not change.
    val probe = Seq((100L, "alpha clustr node"), (101L, "alpha cluster"))
      .toDF("k", "name")
    def best() = FuzzyJoin.resolveBest(master, probe, "k", "name", 4, 2,
      dualBlock = true, verifyDistinctTexts = true)
    val small = best().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = best()
      val p = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the two unhinted joins (verified⋈mKey, probe⋈bestPerText) must
      // degrade; only the probe-side HINTED broadcasts may remain
      assert(p.contains("SortMergeJoin"),
        s"expected the unhinted joins to degrade to shuffle joins past " +
          s"the size bound\n$p")
      val degraded = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      assert(degraded == small, "join strategy changed the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("resolveCapped ≡ top-N window over the full multiset; capped flag = full count > cap") {
    // duplicated texts so several probe keys carry more matches than
    // the cap — the corpus shape the budget exists for
    val dupMaster = master.unionByName(
      master.withColumn("k", col("k") + 100))
    val probe = Seq((100L, "alpha clustr node"), (300L, "Alpha cluster node"),
      (101L, "alpha cluster"), (102L, "alpha clustr node")).toDF("k", "name")
    val cap = 2
    val full = FuzzyJoin.resolve(dupMaster, probe, "k", "name", 4, 2,
      dualBlock = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_key").orderBy(col("dist"), col("match_key"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("probe_key")
    val expect = full
      .withColumn("rn", row_number().over(w))
      .withColumn("capped", (count(lit(1)).over(wc) > cap).cast("int"))
      .where(col("rn") <= cap)
      .select("probe_key", "match_key", "dist", "capped")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3))).sorted.toSeq
    val got = FuzzyJoin.resolveCapped(dupMaster, probe, "k", "name", 4, 2,
      dualBlock = true, cap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3))).sorted.toSeq
    assert(got == expect, s"capped diverged: $got vs $expect")
    assert(got.exists(_._4 == 1), "fixture never exercised the cap")
    assert(got.groupBy(_._1).values.forall(_.size <= cap))
  }

  test("output-bound guard: resolve fails loudly past spark.graft.fuzzy.maxPairs, bounded forms still run") {
    val probe = Seq((100L, "alpha clustr node")).toDF("k", "name")
    spark.conf.set("spark.graft.fuzzy.maxPairs", "1")
    try {
      val eBlocked = intercept[IllegalStateException] {
        FuzzyJoin.resolve(master, probe, "k", "name", 4, 2)
      }
      assert(eBlocked.getMessage.contains("spark.graft.fuzzy.maxPairs"))
      val eExpanded = intercept[IllegalStateException] {
        FuzzyJoin.resolve(master, probe, "k", "name", 4, 2,
          verifyDistinctTexts = true)
      }
      assert(eExpanded.getMessage.contains("resolveCapped"))
      // the budgeted form is output-bounded by construction — no guard
      assert(FuzzyJoin.resolveCapped(master, probe, "k", "name", 4, 2,
        cap = 1).count() == 1)
      // the guard's OTHER recommendation must not trip the guard either:
      // resolveBest's default routes the unguarded distinct-text core
      // (a default of verifyDistinctTexts = false would re-enter the
      // guarded resolve and throw exactly the error that recommended it)
      assert(FuzzyJoin.resolveBest(master, probe, "k", "name", 4, 2)
        .count() == 1)
    } finally spark.conf.unset("spark.graft.fuzzy.maxPairs")
  }
}
