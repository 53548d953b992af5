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

  test("zero vector degrades to NaN — JVM arithmetic, never an ANSI throw") {
    GraftFunctions.ensureRegistered(spark)
    // doGenCode emits raw Java division (IEEE): a zero-norm vector gives
    // NaN instead of killing the job the way an ANSI SQL division would.
    // Spark SQL (like DuckDB) orders NaN GREATER than every value, so a
    // NaN cosine passes `>= threshold` filters — cross-engine-consistent,
    // and the reason zero vectors should be filtered upstream of
    // cosineNearDup, not relied on to self-exclude.
    val df = Seq((Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val v = df.select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    assert(v.isNaN, s"expected NaN for zero vector, got $v")
    assert(df.select((GraftFunctions.cosineSim(col("a"), col("b")) >= 0.5)
      .as("keep")).collect().head.getBoolean(0),
      "Spark NaN ordering: NaN >= threshold must be TRUE (documented semantics)")
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
