package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SemDedupIndex, Similarity}

/** Dev measurement main (round-16 ask #2): the DIRECT evidence for the
  * SemDedupIndex amortization claim. SCALE.md §Round-15 showed one
  * point (100× fixture: in-query 24.9 vs probe 9.2 s/batch); this
  * curve HOLDS THE BATCH CONSTANT (the 40k sf10 tail) and grows the
  * corpus 1×/10×/100× by deterministic modulus subsets of the 100×
  * fixture's corpus side — same resampled distribution, so cell
  * geometry scales honestly. The claim the table must support:
  *
  *   - in_query ([[Similarity.semanticDedupIncrementalCells]], which
  *     re-trains per call) GROWS with the corpus — its Lloyd + corpus
  *     assignment passes are O(corpus) per batch;
  *   - probe ([[SemDedupIndex.probe]] against the pre-built index)
  *     stays ~FLAT — assign-incoming is batch-proportional and the
  *     member/vecs reads prune to the batch's cells' buckets.
  *
  * Protocol = SemDedupBatch's (warm-first, min-of-2 per arm, calm
  * host). `runMain graft.SemDedupCorpusCurve <sfDir>` (default
  * /tmp/sf10 — the MakeScale 100× fixture).
  */
object SemDedupCorpusCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .appName("graft-semdedup-corpus-curve").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    // fixed batch: the fixture's held-out tail (the sf10 40k)
    val batch = emb.where(col("vec_id") % 10 >= 8).localCheckpoint()
    val nBatch = batch.count()
    println(s"dir=$dir batch=$nBatch (held constant)")
    println("corpus_factor corpus_n in_query_s build_once_s probe_s")
    def t(f: => Unit): Double = {
      val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
    }
    // 1×/10×/100× corpus: modulus subsets of the corpus side (%10<8)
    // keep the resampled distribution while scaling n
    Seq(("1x", 1000L), ("10x", 100L), ("100x", 10L)).foreach {
      case (label, m) =>
        val corpus = emb.where(col("vec_id") % m < 8).localCheckpoint()
        val n = corpus.count()
        def inQuery(): Unit =
          Similarity.semanticDedupIncrementalCells(batch, corpus)
            .queryExecution.toRdd.count()
        inQuery() // warm
        val inq = Seq(t(inQuery()), t(inQuery())).min
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_sdc_$label").toString
        val build = t(SemDedupIndex.build(corpus, root))
        def probe(): Unit =
          SemDedupIndex.probe(spark, root, batch)
            .queryExecution.toRdd.count()
        probe() // warm
        val prb = Seq(t(probe()), t(probe())).min
        println(f"$label $n $inq%.2f $build%.2f $prb%.2f")
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
