package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Propagation

/** Dev measurement main (round-15 ask #7): the contract-then-close
  * components path had never been timed on a graph that actually
  * exceeds the union-find gate with realistic bucket structure. This
  * harness synthesizes an LSH-SHAPED grouped pair graph — vertices
  * assigned to 2 buckets each (the probes=2 / multi-band shape),
  * buckets of ~32 members emitting their full pair list, the second
  * assignment SHIFTED so consecutive buckets chain into giant
  * components (the worst case for any label-propagation closure) — at
  * 30–50M directed pairs, then times:
  *
  *   A. contractThenClose on the grouped pairs (the production
  *      past-bound path: per-bucket union-find, condensed closure)
  *   B. single-task union-find on the FULL pair list (the at-bound
  *      strategy, run past its documented budget as the baseline)
  *
  * and cross-checks A ≡ B label-for-label. Shuffle telemetry (total
  * write + max single-stage write) comes from a stage listener — the
  * "peak shuffle" number the 100 TB argument needs: phase A's one
  * bucket-keyed shuffle dominates, and the condensed closure runs on a
  * graph ~pairs/30 the size. Results land in SCALE.md §Round-15.
  *
  * `runMain graft.ContractionScale [nVertices]` (default 1,200,000
  * ≈ 37M directed pairs).
  */
object ContractionScale {
  private class ShuffleMeter extends SparkListener {
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      total.addAndGet(w)
      peak.getAndUpdate(p => math.max(p, w))
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1200000L)
    val spark = SparkSession.builder()
      .appName("graft-contraction-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // memberships: vertex v in bucket v/32 and, shifted by 16, in
    // bucket B0 + (v+16)/32 of a second bucket family — every
    // consecutive window overlaps, chaining the whole range into one
    // component whose BUCKET-level diameter is ~n/16 (the closure
    // stress); ids scrambled by the UfCrossover modular bijection so
    // no strategy sees sorted input
    val P = 2147483629L
    def perm(c: org.apache.spark.sql.Column) = (c * 48271L) % P
    val b0 = n / 32 + 1
    // integer `div`, not `/` (double division would give every vertex
    // its own fractional bucket key and an empty pair list)
    val mem = spark.range(n).select(perm(col("id")).as("vid"),
        expr("id div 32").as("gkey"))
      .unionByName(spark.range(n).select(perm(col("id")).as("vid"),
        (lit(b0) + expr("(id + 16) div 32")).as("gkey")))
    val dir = java.nio.file.Files.createTempDirectory("graft_ctr_").toString
    // grouped pairs exactly as the LSH/cells engines generate them:
    // bucket self-join, d1 < d2; parquet round-trip gives the loop the
    // honest statistics leaf (the UfCrossover lesson)
    mem.as("x").join(mem.as("y"), Seq("gkey"))
      .where(col("x.vid") < col("y.vid"))
      .select(col("gkey"), col("x.vid").as("d1"), col("y.vid").as("d2"))
      .write.mode("overwrite").parquet(s"$dir/grouped")
    val grouped = spark.read.parquet(s"$dir/grouped")
    val nPairs = grouped.count()
    val nVerts = grouped.select(col("d1").as("v"))
      .unionByName(grouped.select(col("d2").as("v"))).distinct().count()
    println(s"n=$n grouped_pairs=$nPairs distinct_verts=$nVerts " +
      s"buckets=${2 * n / 32} bound=${Propagation.DefaultLocalEdgeBound}")

    def measure(label: String)(f: => DataFrame): (Double, DataFrame) = {
      val m = new ShuffleMeter
      spark.sparkContext.addSparkListener(m)
      val t0 = System.nanoTime()
      val out = f
      out.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let stage events drain
      spark.sparkContext.removeSparkListener(m)
      println(f"$label%-22s ${sec}%8.1f s  shuffle_total=${m.total.get / 1e6}%9.0f MB" +
        f"  shuffle_peak_stage=${m.peak.get / 1e6}%7.0f MB")
      (sec, out)
    }

    val (_, viaContract) = measure("contract_then_close") {
      graft.operators.Stage.snap(Propagation.contractThenClose(
        grouped, "vid", materialize = true,
        maxRounds = Propagation.DefaultMaxRounds), materialize = true)
    }
    // phase anatomy for the SCALE.md row: how much the per-bucket
    // union-find condenses before the global closure (whose strategy —
    // re-gated union-find vs distributed rounds — the condensed size
    // against the gate decides)
    val locals = Propagation.groupLocalLabels(grouped, materialize = true)
    val nBridgeDirected = Propagation.bridgeEdges(locals, materialize = true)
      .count() / 2
    println(s"condensed bridge pairs (directed): $nBridgeDirected " +
      s"(${100.0 * nBridgeDirected / nPairs}%% of input; gate=" +
      s"${Propagation.DefaultLocalEdgeBound} -> " +
      (if (nBridgeDirected <= Propagation.DefaultLocalEdgeBound)
        "closure re-gates to the single-task union-find"
      else "closure runs distributed hook-and-contract rounds") + ")")
    val (_, viaUf) = measure("union_find_full") {
      graft.operators.Stage.snap(Propagation.unionFindLocal(
        grouped.select(col("d1").as("a"), col("d2").as("b")), "vid"),
        materialize = true)
    }
    val mismatches = viaContract
      .join(viaUf.withColumnRenamed("label", "label_uf"), Seq("vid"))
      .where(col("label") =!= col("label_uf")).count()
    println(s"label mismatches vs union-find ground truth: $mismatches")
    require(mismatches == 0, "contract-then-close diverged from union-find")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
