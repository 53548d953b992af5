package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Dev diagnostic: wall-time and structural breakdown of the SemDeDup
  * cell-clustering strategies (round-13 perf work; feeds SCALE.md's
  * rounds table). Not a gated artifact.
  *
  * args: [sfDir] — e.g. /root/testdata/sf0.1 or a MakeScale output. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-diag").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"DIAG $name%-34s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    t("warm count")(emb.count())
    t("semanticDedupCells (union-find)") {
      Similarity.semanticDedupCells(emb, threshold = 0.35).count()
    }
    spark.conf.set("spark.graft.components.localEdges", "0")
    t("semanticDedupCells (contraction)") {
      try Similarity.semanticDedupCells(emb, threshold = 0.35).count()
      finally spark.conf.unset("spark.graft.components.localEdges")
    }
    val stats = t("cellContractionStats") {
      Similarity.cellContractionStats(emb)
    }
    stats.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"DIAG stat $k = $v")
    }
    spark.stop()
  }
}
