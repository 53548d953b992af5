package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming consumption of the CDC `events` table (the stand-in
  * for the reference's lifecycle hooks, SURVEY §2.11 T1–T4;
  * `includes/class-lifecycle.php:17-31`): watermarked tumbling-window
  * aggregation, run with `Trigger.AvailableNow` so a batch of parquet
  * drives the streaming query synchronously.
  *
  * Scale posture: the hourly agg is keyed on (window, event_type) — state
  * store size is bounded by the watermark horizon, not the stream length.
  */
object EventStream {

  /** Hourly event counts + value sums, computed through a real streaming
    * query (memory sink, complete mode), returned as a batch DataFrame. */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // ts is TIMESTAMP(NANOS) in the parquet — read as long nanos (legacy
    // conf) and convert with integer division, same as Catalog.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path).schema
    // FileStreamSource force-sets basePath to the path itself for non-glob
    // paths, and basePath must be a directory — so address the single file
    // through a glob, which leaves basePath inference to the parent dir.
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events*.parquet")
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"))
    val name = s"graft_hourly_${System.nanoTime()}"
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
      .orderBy("hour", "event_type")
  }
}
