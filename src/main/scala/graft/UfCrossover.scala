package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Propagation

/** Dev measurement main (round-13 ask #4): the union-find size gate's
  * 8M-edge default was justified by byte arithmetic, not measurement.
  * This harness synthesizes pair graphs at a sweep of edge counts —
  * chain-heavy (the loop's worst case: rounds ∝ log diameter) mixed
  * with 4-cliques (the near-dup norm: dense local structure) — and
  * times the single-task union-find against the distributed round
  * loop (pointer-doubling in round 14's harness run; Borůvka
  * hook-and-contract since) on the SAME snapped edge set. The measured
  * crossover sets (or confirms) `spark.graft.components.localEdges`;
  * the table lands in SCALE.md §Round-14.
  *
  * Memory column: the parent map is two long arrays at power-of-2
  * capacity ≥ 2·V — reported analytically (capacity × 16 B) because it
  * is exact by construction; wall-clocks are measured.
  */
object UfCrossover {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-uf-crossover").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000000L, 2000000L, 4000000L, 8000000L, 16000000L)
    println("edges_target edges verts uf_sec loop_sec loop_rounds map_mb")
    sizes.foreach(run(spark, _))
    spark.stop()
  }

  /** Chain+clique pair graph of ~e edges: 3/4 of edges form 64-vertex
    * chains (diameter 63 — the round loop's log-depth stress case),
    * 1/4 form 4-cliques (6 edges per 4 vertices — the dense near-dup
    * clump). Ids are scrambled by a modular bijection i ↦ i·48271 mod p
    * (p prime > any id here, product < 2^47 — overflow-free) so neither
    * strategy sees sorted input, while the id DOMAIN stays bounded like
    * real doc/vec ids. NOT xxhash64: full-range 2^63 ids made the
    * round-loop's per-round localCheckpoint hang in BigInteger
    * arithmetic — Spark's plan-statistics estimates snowball through
    * the per-round stats carry until size products reach millions of
    * digits (measured: a 128-vertex graph burned 1000+ s of CPU inside
    * BigInteger.multiplyToomCook3). A real propagation corpus keys on
    * bounded doc/vec ids, so the bounded domain is also the honest
    * simulation. */
  private def synth(spark: SparkSession, e: Long): DataFrame = {
    val P = 2147483629L // prime > 2^31 - 20
    def perm(c: org.apache.spark.sql.Column) = (c * 48271L) % P
    val chainEdges = e * 3 / 4
    val chainVerts = chainEdges * 64 / 63
    val chains = spark.range(chainVerts)
      .where(col("id") % 64 =!= 63)
      .select(perm(col("id")).as("a"), perm(col("id") + 1).as("b"))
    val nCliques = (e - chainEdges) / 6
    // clique c occupies 4 ids in a disjoint domain above the chains;
    // row k of the clique's 6 rows emits unordered pair (i, j) of
    // {0,1,2,3}: (0,1)(0,2)(0,3)(1,2)(1,3)(2,3)
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
    chains.unionByName(cliques)
  }

  private def run(spark: SparkSession, e: Long): Unit = {
    // round-trip the synth through PARQUET, not a bare localCheckpoint:
    // a range-derived LogicalRDD leaf carries no usable size statistics,
    // and the loop's per-round snapshots then compound the default
    // estimates into BigInt products that eventually dominate (and at
    // ~25 rounds overflow) the optimizer — a harness artifact production
    // never sees, because production pair graphs descend from parquet
    // scans with real sizeInBytes. The parquet leaf reproduces that.
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_ufx_$e").toString
    synth(spark, e).write.mode("overwrite").parquet(dir)
    val edges = spark.read.parquet(dir)
    val nEdges = edges.count()
    val nVerts = edges.select(col("a").as("v"))
      .unionByName(edges.select(col("b").as("v"))).distinct().count()
    def time[A](f: => A): (Double, A) = {
      val s = System.nanoTime(); val r = f
      ((System.nanoTime() - s) / 1e9, r)
    }
    val (ufSec, _) = time {
      Propagation.unionFindLocal(edges, "vid")
        .queryExecution.toRdd.count()
    }
    spark.conf.set("spark.graft.components.localEdges", "0")
    // diameter-63 chains converge in ~10 rounds (hook + inner
    // compression); cap at 16 so a mis-converging run reports loudly
    // instead of spinning
    val (loopSec, rounds: Int) =
      try time {
        // symmetric form: the loop contract expects both directions
        val sym = edges.unionByName(
          edges.select(col("b").as("a"), col("a").as("b")))
        val r = Propagation.minLabelCounted(sym, "vid", 0, true, 16)
        r.labels.queryExecution.toRdd.count()
        r.rounds
      } catch {
        case ex @ (_: IllegalStateException | _: ArithmeticException) =>
          println(s"LOOP FAILED: ${ex.getClass.getSimpleName} ${ex.getMessage}")
          (Double.NaN, -1)
      } finally spark.conf.unset("spark.graft.components.localEdges")
    // capacity = next power of 2 above 2·V; 16 B per slot (key + value)
    val cap = java.lang.Long.highestOneBit(math.max(16L, nVerts) * 2 - 1) << 1
    val mapMb = cap * 16.0 / 1e6
    println(f"$e $nEdges $nVerts $ufSec%.2f $loopSec%.2f $rounds $mapMb%.0f")
    // repeated sweeps must not accumulate edge fixtures in /tmp
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally walk.close()
  }
}
