package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev measurement main (round-13 ask #2): candidate volume of the
  * cell-local near-dup scheme at probes = 2/3/4 on a given corpus
  * (threshold −1 admits every candidate, so the pair count IS the
  * cost). Recall at the operating threshold is measured against the
  * exact all-pairs baseline by SimilarityQualitySpec (feasible only at
  * oracle scale); this main supplies the cost side of the curve at
  * larger corpora. Table lands in SCALE.md §Round-14.
  *
  * `runMain graft.ProbesCurve <sfDir> [probes...]`
  */
object ProbesCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(2, 3, 4)
    val spark = SparkSession.builder()
      .appName("graft-probes-curve").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    val n = emb.count()
    println(s"dir=$dir n_vectors=$n")
    println("probes candidates candidates_per_vec sec")
    probes.foreach { p =>
      val t0 = System.nanoTime()
      val c = Similarity
        .cosineNearDupCells(emb, probes = p, threshold = -1.0).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$p $c ${c.toDouble / n}%.1f $dt%.2f")
    }
    spark.stop()
  }
}
