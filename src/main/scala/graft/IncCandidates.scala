package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev measurement main (round-13 ask #1's done-criterion): per-vector
  * candidate counts of the CELLS vs BANDED incremental semantic-dedup
  * schemes on the standard 80/20 split of a corpus — run at two corpus
  * sizes, the cells number must stay ~flat while the banded one grows
  * with the corpus (candidates ≈ bands·n/2^bits). Table lands in
  * SCALE.md §Round-14.
  *
  * `runMain graft.IncCandidates <sfDir> [<sfDir2> ...]`
  */
object IncCandidates {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-inc-candidates").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("dir n_incoming n_corpus cells_per_vec banded_per_vec")
    dirs.foreach { dir =>
      val emb = graft.catalog.Catalog.embeddings(spark, dir)
      val stats = Similarity.incrementalCandidateStats(
        emb.where(col("vec_id") % 10 >= 8),
        emb.where(col("vec_id") % 10 < 8))
      val n = math.max(1L, stats("n_incoming")).toDouble
      println(f"$dir ${stats("n_incoming")} ${stats("n_corpus")} " +
        f"${stats("cells_candidates") / n}%.1f " +
        f"${stats("banded_candidates") / n}%.1f")
    }
    spark.stop()
  }
}
