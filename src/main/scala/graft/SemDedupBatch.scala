package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{SemDedupIndex, Similarity}

/** Dev measurement main (round-15 ask #1's done-criterion): the
  * per-batch wall-clock of incremental semantic dedup WITHOUT the
  * quantizer-training term. Protocol = R14Sample's (warm-first,
  * min-of-2 per arm) on the 100× MakeScale fixture:
  *
  *   in_query  — [[Similarity.semanticDedupIncrementalCells]], which
  *               re-trains the corpus quantizer per call (O(corpus)
  *               Lloyd + assign inside every batch)
  *   build     — [[SemDedupIndex.build]], paid ONCE per corpus (the
  *               amortized training+assignment)
  *   probe     — [[SemDedupIndex.probe]] per batch: assign-incoming +
  *               stored-cell-mate join; the steady-state ingest cost
  *
  * The claim the numbers must support: probe ≈ in_query − training
  * term, and probe's cost scales with the BATCH (plus one narrow
  * corpus-assignment scan), not with corpus-sized training.
  *
  * `runMain graft.SemDedupBatch <sfDir>` (default /tmp/sf10).
  */
object SemDedupBatch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .appName("graft-semdedup-batch").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    val corpus = emb.where(col("vec_id") % 10 < 8)
    val batch = emb.where(col("vec_id") % 10 >= 8)
    println(s"dir=$dir corpus=${corpus.count()} batch=${batch.count()}")
    def t(f: => Unit): Double = {
      val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
    }
    def inQuery(): Unit =
      Similarity.semanticDedupIncrementalCells(batch, corpus)
        .queryExecution.toRdd.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft_sdb_").toString
    def probe(): Unit =
      SemDedupIndex.probe(spark, root, batch)
        .queryExecution.toRdd.count()
    inQuery() // warmup (also warms the parquet source)
    val inq = Seq(t(inQuery()), t(inQuery())).min
    val build = t(SemDedupIndex.build(corpus, root))
    probe() // warmup
    val prb = Seq(t(probe()), t(probe())).min
    println(f"in_query_per_batch=$inq%.2f s  build_once=$build%.2f s  " +
      f"probe_per_batch=$prb%.2f s  training_term_removed=${inq - prb}%.2f s")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    spark.stop()
  }
}
