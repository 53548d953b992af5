package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Stage

/** Scratch debug main for the round-14 crossover-harness anomaly: the
  * distributed min-label loop converges in 10 rounds on a 100k-edge
  * chain+clique graph but NOT in 16 on the same construction at 200k.
  * Replicates Propagation.minLabelCounted inline with per-round
  * changed-label counts and a sample of stuck vertices. Not part of any
  * driven surface; delete once the anomaly is explained.
  */
object DebugLoop {
  def main(args: Array[String]): Unit = {
    val e = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .appName("graft-debug-loop").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val P = 2147483629L
    def perm(c: org.apache.spark.sql.Column) = (c * 48271L) % P
    val chainEdges = e * 3 / 4
    val chainVerts = chainEdges * 64 / 63
    val chains = spark.range(chainVerts)
      .where(col("id") % 64 =!= 63)
      .select(perm(col("id")).as("a"), perm(col("id") + 1).as("b"))
    val nCliques = (e - chainEdges) / 6
    val cliques = spark.range(nCliques * 6)
      .select(expr("id div 6").as("g"), (col("id") % 6).as("k"))
      .select(col("g"),
        when(col("k") < 3, lit(0)).when(col("k") < 5, lit(1))
          .otherwise(lit(2)).as("i"),
        when(col("k") === 0, lit(1)).when(col("k") === 1, lit(2))
          .when(col("k") === 2, lit(3)).when(col("k") === 3, lit(2))
          .when(col("k") === 4, lit(3)).otherwise(lit(3)).as("j"))
      .select(
        perm(lit(chainVerts + 1) + col("g") * 4 + col("i")).as("a"),
        perm(lit(chainVerts + 1) + col("g") * 4 + col("j")).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_dbg").toString
    chains.unionByName(cliques).write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val edges: DataFrame = base.unionByName(
      base.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    println(s"edges=${edges.count()}")

    val idCol = "vid"
    val vertices = edges.select(col("a").as(idCol)).distinct()
    var labels = vertices.select(col(idCol), col(idCol).as("label"))
    var round = 0
    var converged = false
    while (!converged && round < 24) {
      val nbrMin = edges.join(labels, edges("b") === labels(idCol))
        .groupBy(col("a")).agg(min("label").as("nl"))
      val stepped = labels
        .join(nbrMin, labels(idCol) === nbrMin("a"), "left_outer")
        .select(col(idCol), col("label").as("prev_label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      val jumped = if (round < 2) stepped else {
        val lmap = labels
          .select(col(idCol).as("pj_id"), col("label").as("pj_label"))
        stepped
          .join(lmap, stepped("label") === lmap("pj_id"), "left_outer")
          .select(col(idCol), col("prev_label"),
            least(col("label"), coalesce(col("pj_label"), col("label")))
              .as("label"))
      }
      val snapped = Stage.snapLazy(jumped)
      val changed = snapped.where(col("label") =!= col("prev_label")).count()
      val nrows = snapped.count()
      converged = changed == 0L
      println(s"round=$round changed=$changed rows=$nrows")
      if (round >= 12) {
        snapped.where(col("label") =!= col("prev_label"))
          .orderBy(idCol).limit(3).collect()
          .foreach(r => println(s"  stuck: $r"))
      }
      labels = snapped.select(idCol, "label")
      round += 1
    }
    spark.stop()
  }
}
