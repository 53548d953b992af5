package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Propagation, Similarity, Stage}

/** Dev diagnostic: stage-by-stage wall-time breakdown of the SemDeDup
  * cell chain (round-13 perf work). Not a gated artifact. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val aqe = args.drop(1).headOption.getOrElse("true")
    val spark = SparkSession.builder()
      .appName("graft-diag").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"DIAG $name%-28s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    t("warm count")(emb.count())
    val pairs = t("cosineNearDupCells") {
      val p = Similarity.cosineNearDupCells(emb, threshold = 0.35)
      println(s"DIAG pairs = ${p.count()}")
      p
    }
    val edges = t("edges snap (union x2)") {
      Stage.snap(
        pairs.select(col("d1").as("a"), col("d2").as("b"))
          .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b"))),
        materialize = true)
    }
    println(s"DIAG edges = ${edges.count()}, vertices = " +
      edges.select("a").distinct().count())
    val lab = t("minLabelCounted") {
      val l = Propagation.minLabelCounted(edges, "vec_id")
      println(s"DIAG rounds = ${l.rounds}, labels = ${l.labels.count()}")
      l
    }
    println(s"DIAG clusters = " +
      lab.labels.select("label").distinct().count())
    t("full semanticDedupCells") {
      Similarity.semanticDedupCells(emb, threshold = 0.35).count()
    }
    spark.stop()
  }
}
