package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Similarity

/** Dev measurement main (round-13 ask #2): candidate volume of the
  * cell-local near-dup scheme at probes = 2/3/4 on a given corpus
  * (threshold −1 admits every candidate, so the pair count IS the
  * cost). Recall at the operating threshold is measured against the
  * exact all-pairs baseline by SimilarityQualitySpec (feasible only at
  * oracle scale); this main supplies the cost side of the curve at
  * larger corpora. Table lands in SCALE.md §Round-14.
  *
  * `runMain graft.ProbesCurve <sfDir> [probes...]`
  *
  * HYBRID mode (round-16 ask #7): `runMain graft.ProbesCurve <sfDir>
  * hybrid [probes...]` measures the retrieval stack instead — fused
  * recall@10 of [[graft.operators.LexIndex.hybridAnn]] (persisted
  * AnnIndex vector leg at each probe count) against the brute
  * [[graft.operators.LexIndex.hybrid]] baseline, plus wall-clock per
  * batched query set. The monotonicity gate lives in
  * SimilarityQualitySpec; this main supplies the curve at corpus
  * scale. */
object ProbesCurve {

  private def hybridMode(spark: SparkSession, dir: String,
      probes: Seq[Int]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, LexIndex}
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    val docs = graft.catalog.Catalog.documents(spark, dir)
    val lexRoot = java.nio.file.Files
      .createTempDirectory("graft_pc_lex").toString
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft_pc_ann").toString
    try hybridModeAt(spark, dir, probes, lexRoot, annRoot, emb, docs)
    finally Seq(lexRoot, annRoot).foreach(r =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r)))
  }

  private def hybridModeAt(spark: SparkSession, dir: String,
      probes: Seq[Int], lexRoot: String, annRoot: String,
      emb: DataFrame, docs: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, LexIndex}
    LexIndex.build(spark, docs, lexRoot)
    AnnIndex.build(emb, annRoot)
    val terms = Seq("vector", "merge")
    val nQ = 16
    val queries = emb.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .localCheckpoint()
    val k = 10
    val exact: Map[Long, Set[Long]] = (0L until nQ.toLong).map { q =>
      q -> LexIndex.hybrid(spark, lexRoot, terms, emb, q, k = k)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    println(s"dir=$dir n_vectors=${emb.count()} n_queries=$nQ k=$k " +
      s"baseline=brute hybrid")
    println("probes recall_at_10 sec_batch")
    probes.foreach { p =>
      def run() = LexIndex.hybridAnn(spark, lexRoot, terms, annRoot,
        queries, k = k, nProbes = p)
        .collect().toSeq.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      run() // warm
      val t0 = System.nanoTime()
      val got = run()
      val dt = (System.nanoTime() - t0) / 1e9
      val rec = exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / exact.size
      println(f"$p $rec%.3f $dt%.2f")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hybrid = args.lift(1).contains("hybrid")
    val rest = args.drop(if (hybrid) 2 else 1)
    val probes = if (rest.nonEmpty) rest.map(_.toInt).toSeq
      else if (hybrid) Seq(1, 2, 4)
      else Seq(2, 3, 4)
    val spark = SparkSession.builder()
      .appName("graft-probes-curve").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (hybrid) { hybridMode(spark, dir, probes); spark.stop(); return }
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    val n = emb.count()
    println(s"dir=$dir n_vectors=$n")
    println("probes candidates candidates_per_vec sec")
    probes.foreach { p =>
      val t0 = System.nanoTime()
      val c = Similarity
        .cosineNearDupCells(emb, probes = p, threshold = -1.0).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$p $c ${c.toDouble / n}%.1f $dt%.2f")
    }
    spark.stop()
  }
}
