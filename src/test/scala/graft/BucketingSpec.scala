package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.operators.Bucketing

/** Bucketed co-located joins: same-bucketed tables join with ZERO
  * exchanges (the shuffle was paid once at layout time), results match
  * the plain join, and a path-only read — which silently loses the
  * bucket spec — is demonstrably different in plan, guarding against
  * that regression.
  */
class BucketingSpec extends SparkSpec {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private lazy val dirs = {
    val base = Files.createTempDirectory("graft_buckets").toString
    Bucketing.writeBucketed(
      Catalog.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
      "b_orders", "o_orderkey", 8, s"$base/orders")
    Bucketing.writeBucketed(
      Catalog.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8, s"$base/lineitem")
    base
  }

  test("same-bucketed fact join plans with ZERO exchanges") {
    dirs
    // forbid broadcast: at test SF the dims would broadcast and make the
    // no-exchange assertion vacuous — the claim under test is the
    // fact⋈fact SortMergeJoin riding the bucket layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cogroupJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val p = explain(joined)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join result equals the plain join") {
    dirs
    val got = Bucketing.cogroupJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(_.toString).sorted.toSeq
    val want = Catalog.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .join(Catalog.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("q"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("a path-only read LOSES the bucket layout — the catalog table is load-bearing") {
    dirs
    val l = spark.read.parquet(s"$dirs/lineitem")
    val r = spark.read.parquet(s"$dirs/orders")
    val p = explain(l.join(r, l("l_orderkey") === r("o_orderkey")))
    // without the catalog's bucket spec the same files DO shuffle (unless
    // the small side got broadcast — force the check onto the big side)
    val shuffles = p.contains("Exchange hashpartitioning")
    val broadcast = p.contains("BroadcastHashJoin")
    assert(shuffles || broadcast,
      s"expected the spec-less read to lose co-location\n$p")
  }
}
