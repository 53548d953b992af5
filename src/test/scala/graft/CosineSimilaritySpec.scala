package graft

import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.Functions

/** The native codegen'd CosineSimilarity must agree bitwise with the
  * higher-order-function composition it replaces (both are sequential
  * double accumulation in index order) and with a hand computation.
  */
class CosineSimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("matches the HOF cosine bitwise and a hand computation") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)), // orthogonal → 0
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)), // identical → 1
      (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)), // 45° → 1/√2
      (Array(-1.0f, 2.5f, 0.5f), Array(3.0f, -0.25f, 4.0f))
    ).toDF("a", "b")
    val rows = df.select(
      GraftFunctions.cosineSim(col("a"), col("b")).as("native"),
      Functions.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    assert(rows(0).getDouble(0) == 0.0)
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(rows(2).getDouble(0) - 1.0 / math.sqrt(2)) < 1e-15)
  }

  test("zero vector returns 0.0 — never a NaN that would rank #1 everywhere") {
    GraftFunctions.ensureRegistered(spark)
    // round-11 review: the raw 0/0 NaN ordered ABOVE every real number
    // in Spark, so one failed-encode zero vector ranked as the top
    // neighbor in every cos-desc path and passed every `>= threshold`
    // dup test. The guard returns 0.0: a real value that never wins a
    // ranking and never passes a positive threshold.
    val df = Seq(
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(0.0f, 0.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(0.0f, 0.0f, 0.0f))
    ).toDF("a", "b")
    // both the codegen'd native expression and the HOF fallback
    val got = df.select(
      GraftFunctions.cosineSim(col("a"), col("b")).as("native"),
      Functions.cosine(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == 0.0, s"native gave ${r.getDouble(0)}")
      assert(r.getDouble(1) == 0.0, s"hof gave ${r.getDouble(1)}")
    }
    assert(!df.select((GraftFunctions.cosineSim(col("a"), col("b")) >= 0.5)
      .as("keep")).collect().head.getBoolean(0),
      "a degenerate cosine must NOT pass a positive threshold")
    // end-to-end: a zero vector in the corpus never outranks real ones
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(100)
      .unionByName(Seq((999999L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(emb, nQueries = 2, k = 3)
      .collect()
    assert(!top.exists(r => r.getLong(1) == 999999L && r.getInt(3) == 1),
      "a zero vector ranked as the #1 neighbor")
  }

  test("codegen and interpreted paths agree on real embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("x").crossJoin(e.as("y"))
      .where(col("x.vec_id") < col("y.vec_id")).limit(200)
    val viaNative = pairs.select(
      GraftFunctions.cosineSim(col("x.embedding"), col("y.embedding")).as("c"))
    val viaHof = pairs.select(
      Functions.cosine(col("x.embedding"), col("y.embedding")).as("c"))
    val n = viaNative.collect().map(_.getDouble(0))
    val h = viaHof.collect().map(_.getDouble(0))
    assert(n.length == h.length && n.nonEmpty)
    n.zip(h).foreach { case (a, b) =>
      assert(java.lang.Double.compare(a, b) == 0, s"$a != $b")
    }
  }
}
