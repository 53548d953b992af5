package graft

import graft.operators.Similarity

/** The ANN operators must APPROXIMATE well, not just run: IVF top-k is
  * graded by its recall against the brute-force baseline on the same
  * corpus (deterministic inputs → exact, reproducible recall numbers).
  * Multi-probe and the k-means refinement must not degrade recall below
  * the single-probe seed quantizer.
  */
class SimilarityQualitySpec extends SparkSpec {

  private lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def resultSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().toSeq
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("IVF recall vs brute force is real, and multi-probe strictly helps") {
    val exact = resultSet(Similarity.bruteForceTopK(embeddings))
    val ivf1 = recall(resultSet(Similarity.ivfTopK(embeddings)), exact)
    val ivf2 = recall(resultSet(Similarity.ivfTopK(embeddings, nProbes = 2)), exact)
    // single-probe over 8 coarse cells must beat random cell assignment
    // (1/8 ≈ 0.125) by a wide margin, and probing 2 cells can only add
    // candidates — recall must be monotone in nProbes
    assert(ivf1 > 0.3, s"ivf single-probe recall $ivf1")
    assert(ivf2 >= ivf1, s"multi-probe recall $ivf2 < single-probe $ivf1")
  }

  test("int8 quantization respects the mathematical error bound") {
    // symmetric rounding quantization: per-dim error <= scale/2, so
    // mse <= scale^2/4 — a hard invariant, not a tuned threshold
    Similarity.quantizeInt8(embeddings).collect().foreach { r =>
      val scale = r.getDouble(1)
      val mse = r.getDouble(3)
      assert(mse <= scale * scale / 4 + 1e-12,
        s"vec ${r.getLong(0)}: mse $mse > bound ${scale * scale / 4}")
      // codes (JSON-serialized for the driver gate) stay in the int8 range
      val codes = r.getString(2).stripPrefix("[").stripSuffix("]")
        .split(",").filter(_.nonEmpty).map(_.trim.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
  }

  test("k-means refinement keeps recall at least competitive with the seed quantizer") {
    val exact = resultSet(Similarity.bruteForceTopK(embeddings))
    val seed = recall(resultSet(Similarity.ivfTopK(embeddings)), exact)
    val refined = recall(resultSet(Similarity.ivfKmeansTopK(embeddings)), exact)
    // Lloyd step re-balances cells; on this corpus it must not collapse
    // recall (allow small movement either way — cell boundaries shift)
    assert(refined >= seed - 0.15, s"refined $refined vs seed $seed")
    assert(refined > 0.3, s"refined recall $refined")
  }
}
