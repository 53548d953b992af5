package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join / salted-agg equivalence on adversarially skewed data:
  * the salt changes physical placement only — the logical result must
  * be IDENTICAL to the plain forms, and the salted shuffle must
  * actually split the hot key across (key, salt) groups.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 90% of the fact rows hit one hot key; dims are small
  private lazy val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong)))
    .toDF("k", "v")
  private lazy val dim = (1L to 9L).map(k => (k, s"name-$k")).toDF("k", "name")

  test("saltedJoin result is row-for-row identical to the plain equi-join") {
    val plain = fact.join(dim, Seq("k")).collect()
      .map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8).collect()
      .map(_.toString).sorted.toSeq
    assert(salted == plain,
      s"salted ${salted.length} rows vs plain ${plain.length}")
  }

  test("saltedJoin shuffles on (key, salt): the hot key spreads over many groups") {
    // physical claim 1: the join key includes the salt
    val p = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("__salt"), s"salt column absent from the plan\n$p")
    // physical claim 2: the hot key's rows really split into multiple
    // salt groups (the whole point — one task no longer owns key 1)
    val saltGroups = fact
      .withColumn("__salt", pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(8L)))
      .where(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(saltGroups >= 4, s"hot key landed in only $saltGroups salt groups")
  }

  test("saltedAgg equals the plain aggregation exactly, including empty and 1-row keys") {
    val plain = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(fact, "k", "v", salts = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("degenerate salts=1 degrades to the plain shapes") {
    val plain = fact.join(dim, Seq("k")).count()
    assert(Skew.saltedJoin(fact, dim, "k", salts = 1).count() == plain)
    val agg = Skew.saltedAgg(fact, "k", "v", salts = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg(1L) == 900L)
  }
}
