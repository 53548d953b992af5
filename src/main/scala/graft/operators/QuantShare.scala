package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement main (round-16 ask #4): SHOULD one trained
  * quantizer feed all three ANN families (AnnIndex 8-cell cosine IVF,
  * AnnIndexPq L2 coarse + PQ, SemDedupIndex cellTarget-32 two-level)?
  * [[SemDedupIndex.searchTopK]] already proved one artifact can serve
  * two FUNCTIONS (dedup-at-ingest + retrieval); this main measures
  * whether merging the three families' TRAININGS would help or hurt:
  *
  *   1. cross-METRIC (AnnIndex vs AnnIndexPq): residual L2 error and
  *      IVF recall when each family runs on the other's centroids —
  *      the coarse quantizers optimize different objectives (cosine
  *      ranking vs L2 residual minimization);
  *   2. cross-GEOMETRY (AnnIndex vs SemDedupIndex): dedup candidate
  *      volume per vector under a FIXED 8-cell quantizer vs the
  *      corpus-adaptive n/cellTarget cells, at two corpus sizes — a
  *      fixed cell count makes candidates corpus-proportional, the
  *      exact scale-killer the cells design removed in r12;
  *   3. training-term cost at two corpus sizes — what sharing would
  *      actually save.
  *
  * Output feeds the SCALE.md §Round-16 rationale paragraph.
  * `runMain graft.operators.QuantShare <sfDir>` (default /tmp/sf10).
  */
object QuantShare {

  private def t(f: => Unit): Double = {
    val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
  }

  /** Mean per-vector squared-L2 residual (nano units) after L2
    * assignment to `cents` (ccell, cce) — the quantity PQ codebooks
    * are trained on; larger residuals mean coarser codes. */
  private def meanResidual(emb: DataFrame, cents: DataFrame): Double =
    Similarity.assignCoarse(emb, cents)
      .select(Similarity.nanoL2(col("embedding"), col("cce")).as("nano"))
      .agg(avg(col("nano"))).head().getDouble(0)

  /** IVF cosine recall@5 over 8 query heads against the brute top-5,
    * with cell assignment against the given centroid table. */
  private def ivfRecall(emb: DataFrame, cents: DataFrame): Double = {
    val exact = Similarity.bruteForceTopK(emb, nQueries = 8, k = 5)
      .collect().toSeq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val assigned = Similarity.assignCells(emb, cents).localCheckpoint()
    val q = assigned.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
    val c = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("ce2"), col("cell"))
    val got = Similarity.cellTopK(q, c, 5, emb)
      .collect().toSeq.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    exact.map { case (qid, truth) =>
      got.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }.sum / exact.size
  }

  /** Dedup candidate volume per vector if every vector's candidates
    * are its cell-mates: Σ cell_size² / n. */
  private def candidatesPerVec(assigned: DataFrame, n: Long): Double =
    assigned.groupBy("cell").agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") * col("cnt"))).head().getLong(0).toDouble / n

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .appName("graft-quant-share").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embAll = graft.catalog.Catalog.embeddings(spark, dir)

    // the two corpus sizes (10x / 100x subsets of the fixture)
    Seq(("10x", 100L), ("100x", 10L)).foreach { case (label, m) =>
      val emb = embAll.where(col("vec_id") % m < 8).localCheckpoint()
      val n = emb.count()
      println(s"== corpus $label: n=$n ==")

      // --- 3. training terms (warm-first min-of-2 per arm) ---
      def annTrain(): DataFrame =
        Similarity.trainCentroids(emb, 8).localCheckpoint()
      def sddTrain(): Unit = {
        val (q, _) = Similarity.trainCellQuantizer(emb, 32,
          materialize = true)
        q.ccsup.queryExecution.toRdd.count(); ()
      }
      annTrain(); val tAnn = Seq(t(annTrain()), t(annTrain())).min
      val pqRoot = java.nio.file.Files
        .createTempDirectory(s"graft_qs_pq_$label").toString
      // AnnIndexPq.build = sampled coarse + codebook training PLUS the
      // full-corpus encode; reported as the build envelope (its two
      // training levels are trainCap-bounded — the term sharing would
      // actually remove is smaller than this number)
      val tPqBuild = t(AnnIndexPq.build(emb, pqRoot, 8, 8))
      sddTrain(); val tSdd = Seq(t(sddTrain()), t(sddTrain())).min
      println(f"train_s ann(sampled-8cell)=$tAnn%.2f " +
        f"pq(build envelope)=$tPqBuild%.2f semdedup(n/32-cells)=$tSdd%.2f")

      // --- 1. cross-metric: each coarse on the other's objective ---
      val annCents = annTrain()
      val pqCoarse = AnnIndexPq.metaTable(spark, pqRoot,
        AnnIndexPq.version(spark, pqRoot), "coarse").localCheckpoint()
      val annAsCoarse = annCents
        .select(col("centroid_id").as("ccell"), col("ce").as("cce"))
      val pqAsCents = pqCoarse
        .select(col("ccell").as("centroid_id"), col("cce").as("ce"))
      val resNative = meanResidual(emb, pqCoarse)
      val resShared = meanResidual(emb, annAsCoarse)
      println(f"pq_residual_nano native_L2=$resNative%.3e " +
        f"shared_cosine=$resShared%.3e " +
        f"penalty=${resShared / resNative}%.3fx")
      val recNative = ivfRecall(emb, annCents)
      val recShared = ivfRecall(emb, pqAsCents)
      println(f"ivf_recall_at5 native_cosine=$recNative%.3f " +
        f"shared_L2=$recShared%.3f")

      // --- 2. cross-geometry: dedup candidates per vector ---
      val fixed8 = Similarity.assignCells(emb, annCents)
        .select("vec_id", "cell")
      val (sddQ, vsup) = Similarity.trainCellQuantizer(emb, 32,
        materialize = true)
      val adaptive = Similarity.assignWithQuantizer(emb, vsup, sddQ, 2)
        .select("vec_id", "cell")
      println(f"dedup_candidates_per_vec fixed_8cell=" +
        f"${candidatesPerVec(fixed8, n)}%.0f adaptive_n_over_32=" +
        f"${candidatesPerVec(adaptive, n)}%.0f (cells=${sddQ.c})")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(pqRoot))
    }
    spark.stop()
  }
}
