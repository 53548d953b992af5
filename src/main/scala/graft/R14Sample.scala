package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev measurement main (round-13 ask #3's done-criterion): IVF-PQ
  * build time with the bounded deterministic training sample (cap
  * 4096, the shipped default) vs full-corpus training (cap huge) on
  * the same corpus — the sampled-training delta SCALE.md quotes.
  * Warm-first discipline: one untimed pass, then min-of-2 per arm.
  *
  * `runMain graft.R14Sample <sfDir>`
  */
object R14Sample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .appName("graft-r14-sample").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    println(s"dir=$dir n=${emb.count()}")
    def t(f: => Unit): Double = {
      val s0 = System.nanoTime(); f; (System.nanoTime() - s0) / 1e9
    }
    def encode(cap: Int): Unit =
      Similarity.ivfPqEncode(emb, trainCap = cap)
        .queryExecution.toRdd.count()
    encode(Similarity.DefaultTrainCap) // warmup
    val sampled = Seq(t(encode(Similarity.DefaultTrainCap)),
      t(encode(Similarity.DefaultTrainCap))).min
    val full = Seq(t(encode(Int.MaxValue)), t(encode(Int.MaxValue))).min
    println(f"ivfPqEncode sampled_cap4096=$sampled%.2f s " +
      f"full_corpus=$full%.2f s")
    spark.stop()
  }
}
