package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexPq, Similarity}

/** Scratch profiler main — per-round staged timings for whatever family
  * is under the knife (not part of the driver surface; SCALE.md quotes
  * its numbers with the round they were taken in). Round 13: where does
  * sim_annpq_store's ~2.7 s-per-iteration actually go — training,
  * codes write, or commit? */
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
    t("ivfPqEncode (training+encode only)") {
      Similarity.ivfPqEncode(emb).count()
    }
    t("ivfPqEncode again (warm)") {
      Similarity.ivfPqEncode(emb).count()
    }
    val rootPath = java.nio.file.Files.createTempDirectory("graft_diag_pq")
    val root = rootPath.toString
    try {
      t("AnnIndexPq.build (total)") {
        AnnIndexPq.build(emb, root)
      }
      val q = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      t("AnnIndexPq.search (cold)") {
        AnnIndexPq.search(spark, root, q, nProbes = 2, k = 5)
          .queryExecution.toRdd.count()
      }
      t("AnnIndexPq.search (warm)") {
        AnnIndexPq.search(spark, root, q, nProbes = 2, k = 5)
          .queryExecution.toRdd.count()
      }
      t("searchRerank (warm)") {
        AnnIndexPq.searchRerank(spark, root, q, emb, nProbes = 2, k = 5,
          poolK = 20).queryExecution.toRdd.count()
      }
    } finally {
      // repeated profiling runs must not accumulate index trees in /tmp
      // (the Bench warmup convention)
      import scala.jdk.CollectionConverters._
      // close the walk stream — it holds a directory handle open until
      // closed, one leaked per Diag run otherwise (round-13 advice)
      val walk = java.nio.file.Files.walk(rootPath)
      try walk.iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    spark.stop()
  }
}
