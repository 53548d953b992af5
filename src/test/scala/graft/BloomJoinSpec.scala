package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.operators.BloomJoin

/** Bloom-pruned join: exact row parity with the plain equi-join (no
  * false negatives by construction), real map-side reduction of the
  * shuffled fact, and both key types.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("row parity with the plain join on a sparse long-keyed dim") {
    val fact = Catalog.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    // a sparse flagged-order set: ~1 in 16 orders
    val dim = Catalog.orders(spark, sfDir)
      .where(col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val got = BloomJoin.pruned(fact, "l_orderkey", dim, "o_orderkey")
      .select("l_orderkey", "l_partkey", "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    val want = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_partkey", "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, s"bloom-pruned join diverged: ${got.length} vs ${want.length} rows")
    assert(want.nonEmpty, "fixture produced an empty join — parity check is vacuous")
  }

  test("the probe actually prunes: surviving fact rows ~ match rate + fpp, not |fact|") {
    val fact = Catalog.lineitem(spark, sfDir).select("l_orderkey")
    val dim = Catalog.orders(spark, sfDir)
      .where(col("o_orderkey") % 16 === 0).select("o_orderkey")
    val total = fact.count()
    val matched = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    // reproduce the operator's pre-shuffle filter alone
    val keys = dim.distinct()
    val bf = keys.stat.bloomFilter("o_orderkey", math.max(1L, keys.count()), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val f = udf((k: Long) => bfB.value.mightContainLong(k))
    val survived = fact.where(f(col("l_orderkey"))).count()
    assert(survived >= matched, "bloom dropped a true match (false negative!)")
    assert(survived <= matched + (total * 0.05).toLong,
      s"pruning too weak: $survived of $total survived for $matched matches")
  }

  test("string keys probe through the same path") {
    val dim = Seq("w3", "w7").toDF("k")
    val fact = (0 until 20).map(i => s"w$i").toDF("fk")
    val got = BloomJoin.pruned(fact, "fk", dim, "k")
      .select("fk").as[String].collect().sorted.toSeq
    assert(got == Seq("w3", "w7"))
  }

  test("codegen probe: row parity with the plain join on long keys") {
    val fact = Catalog.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val dim = Catalog.orders(spark, sfDir)
      .where(col("o_orderkey") % 16 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val got = BloomJoin.prunedCodegen(fact, "l_orderkey", dim, "o_orderkey")
      .select("l_orderkey", "l_partkey", "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    val want = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_partkey", "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want,
      s"codegen bloom join diverged: ${got.length} vs ${want.length} rows")
    assert(want.nonEmpty, "fixture produced an empty join — parity check is vacuous")
  }

  test("codegen probe: string keys hash through xxhash64 on both sides") {
    val dim = Seq("w3", "w7").toDF("k")
    val fact = (0 until 20).map(i => s"w$i").toDF("fk")
    val got = BloomJoin.prunedCodegen(fact, "fk", dim, "k")
      .select("fk").as[String].collect().sorted.toSeq
    assert(got == Seq("w3", "w7"))
  }

  test("codegen probe is native: bloom_might_contain in the plan, no ScalaUDF") {
    import org.apache.spark.sql.execution.ExplainMode
    val fact = Catalog.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val dim = Catalog.orders(spark, sfDir)
      .where(col("o_orderkey") % 16 === 0).select("o_orderkey")
    val p = BloomJoin.prunedCodegen(fact, "l_orderkey", dim, "o_orderkey")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("bloom_might_contain") || p.contains("might_contain"),
      s"native probe expression missing from the plan\n$p")
    assert(!p.contains("UDF"), s"probe fell back to a boxed UDF\n$p")
  }

  test("unsupported key type fails loudly") {
    val dim = Seq(1.5, 2.5).toDF("k")
    val fact = Seq(1.5).toDF("fk")
    intercept[IllegalArgumentException] {
      BloomJoin.pruned(fact, "fk", dim, "k")
    }
  }
}
