package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The scale-dataset generator's invariants — the properties that make
  * a MakeScale output a VALID curve input: keys tile disjointly and
  * joins resolve (no orphan foreign keys), per-key fan-outs and
  * per-group densities are preserved exactly, and the resampled
  * documents/embeddings keep the base corpus's envelope distributions
  * without replica cliques. */
class MakeScaleSpec extends SparkSpec {

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft_mkscale_").toString
    MakeScale.main(Array(sfDir, dir, "2"))
    dir
  }

  test("every scaled foreign key resolves; row counts scale by the factor") {
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ords = spark.read.parquet(s"$out/orders.parquet")
    assert(li.join(ords, li("l_orderkey") === ords("o_orderkey"), "left_anti")
      .count() == 0, "orphan lineitem orderkeys")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(ords.join(cust, ords("o_custkey") === cust("c_custkey"), "left_anti")
      .count() == 0, "orphan order custkeys")
    val baseLi = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(li.count() == 2 * baseLi)
  }

  test("per-customer order density is preserved exactly") {
    def density(path: String) =
      spark.read.parquet(path).groupBy("o_custkey").count()
        .agg(avg("count"), max("count")).head()
    val b = density(s"$sfDir/orders.parquet")
    val s = density(s"$out/orders.parquet")
    assert(b.getDouble(0) == s.getDouble(0) && b.getLong(1) == s.getLong(1),
      s"density drifted: base=$b scaled=$s")
  }

  test("documents resample: envelopes preserved, no exact replica cliques") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    assert(scaled.count() == 2 * base.count())
    // lang/source proportions double exactly (envelopes are copied)
    val bLang = base.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sLang = scaled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sLang == bLang.map { case (k, v) => k -> 2 * v }, s"$bLang vs $sLang")
    // resampled, not replicated: the second copy of a doc id slot must
    // not reproduce the base text verbatim (would hand dedup a clique)
    val n = base.count()
    val texts = scaled.where(col("doc_id") < 3 || (col("doc_id") >= n && col("doc_id") < n + 3))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(texts.take(3).toSeq != texts.drop(3).toSeq,
      "replica texts are verbatim copies")
    // deterministic: a second generation is byte-identical
    val out2 = Files.createTempDirectory("graft_mkscale2_").toString
    MakeScale.main(Array(sfDir, out2, "2"))
    val again = spark.read.parquet(s"$out2/documents.parquet")
    assert(scaled.exceptAll(again).isEmpty && again.exceptAll(scaled).isEmpty,
      "regeneration is not deterministic")
  }

  test("embeddings resample: labels preserved, per-label means tracked") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val scaled = spark.read.parquet(s"$out/embeddings.parquet")
    assert(scaled.count() == 2 * base.count())
    val bl = base.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sl = scaled.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sl == bl.map { case (k, v) => k -> 2 * v })
    // gaussian resample tracks the per-label first-coordinate mean
    val bm = base.groupBy("label").agg(avg(element_at(col("embedding"), 1)))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val sm = scaled.groupBy("label").agg(avg(element_at(col("embedding"), 1)))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    bm.foreach { case (l, m) =>
      assert(math.abs(sm(l) - m) < 0.2, s"label $l mean drifted: $m -> ${sm(l)}")
    }
  }
}
