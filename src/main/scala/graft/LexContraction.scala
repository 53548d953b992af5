package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement main (round-13 ask #5's done-criterion): wall-clock
  * of `Dedup.lshComponents` on the same corpus through its two
  * physical strategies — the default union-find gate, and the
  * past-bound path forced via `spark.graft.components.localEdges = 0`
  * (band-local union-find per (band, sig) bucket, then the condensed
  * closure through the Borůvka loop). Rows are asserted identical.
  * Table lands in SCALE.md §Round-14.
  *
  * `runMain graft.LexContraction <sfDir>`
  */
object LexContraction {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .appName("graft-lex-contraction").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    println(s"dir=$dir docs=${docs.count()}")
    def run(): (Double, Array[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.Dedup.lshComponents(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (ufSec, ufRows) = run()
    spark.conf.set("spark.graft.components.localEdges", "0")
    val (bandSec, bandRows) =
      try run()
      finally spark.conf.unset("spark.graft.components.localEdges")
    require(ufRows.toSeq == bandRows.toSeq, "strategies diverged")
    val clustered = ufRows.count(t => t._1 != t._2)
    println(f"uf_sec=$ufSec%.2f band_contraction_sec=$bandSec%.2f " +
      s"rows=${ufRows.length} clustered=$clustered identical=true")
    spark.stop()
  }
}
