package graft

import org.apache.spark.sql.{functions => F, SparkSession}

/** Throwaway round-12 adjudication probe for lx_hybrid (deleted before
  * handoff): separates index build / lexical search / vector side /
  * fusion so the regression localizes. */
object ProbeHybrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val root = "/tmp/probe_lxh_" + System.nanoTime
    def time(label: String)(body: => Long): Unit = {
      val s = System.nanoTime; val n = body
      println(f"PROBE $label: ${(System.nanoTime - s) / 1e9}%.2f s ($n rows)")
    }
    time("build") {
      graft.operators.LexIndex.build(spark,
        graft.catalog.Catalog.documents(spark, dir), root); 0L
    }
    val emb = graft.catalog.Catalog.embeddings(spark, dir)
    val terms = Seq("vector", "merge", "spark")
    time("search k=50 (1st)") {
      graft.operators.LexIndex.search(spark, root, terms, 50).count() }
    time("search k=50 (2nd)") {
      graft.operators.LexIndex.search(spark, root, terms, 50).count() }
    time("vec side alone") {
      val q = emb.where(F.col("vec_id") === 0L)
        .select(F.col("embedding").as("qe"))
      emb.crossJoin(F.broadcast(q)).where(F.col("vec_id") =!= 0L)
        .select(F.col("vec_id").cast("long").as("doc_id"))
        .orderBy(F.col("doc_id")).limit(50).count()
    }
    time("hybrid (1st)") {
      graft.operators.LexIndex.hybrid(spark, root, terms, emb, 0L, 10, 50)
        .count() }
    time("hybrid (2nd)") {
      graft.operators.LexIndex.hybrid(spark, root, terms, emb, 0L, 10, 50)
        .count() }
    spark.stop()
  }
}
