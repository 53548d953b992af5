package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Temporal

/** Streaming event-rate anomaly monitor — the always-on form of
  * [[Temporal.rateAnomaly]]: each micro-batch folds its (event_type,
  * hour) counts into a parquet hourly-state table, and scoring re-runs
  * the batch operator's trailing-window z over that table.
  *
  * Stream/batch parity is the correctness contract (spec-asserted):
  * after any partition of the event feed into batches, the maintained
  * state equals `Temporal.hourlyOf(allEvents)` — counts merge by sum —
  * so the scores equal the batch operator's output over the union.
  *
  * Replay safety: `foreachBatch` is at-least-once after a crash, so the
  * state records the last applied batch id and a replayed batch is a
  * no-op (the same idempotence-over-transport design as
  * [[StreamingSync]]: effects converge because the SINK dedupes, not
  * because the transport promises exactly-once).
  *
  * Scale posture: the ONLY state is the hourly table — bounded by
  * types × hours, independent of event volume; each batch's fold is one
  * combinable count plus a merge over that small table. The raw events
  * are never retained.
  */
object StreamingMonitor {

  private def countsPath(statePath: String) = s"$statePath/hourly"
  private def metaPath(statePath: String) = s"$statePath/meta"

  private def lastApplied(spark: SparkSession, statePath: String): Long =
    try spark.read.parquet(metaPath(statePath))
      .agg(max("batch_id")).head.getLong(0)
    catch { case _: Throwable => -1L }

  /** Fold one micro-batch of raw events into the hourly state.
    * Idempotent per `batchId`: a replay of an already-applied batch id
    * leaves the state untouched. */
  def applyBatch(statePath: String, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batchId <= lastApplied(spark, statePath)) return
    val inc = Temporal.hourlyOf(batch)
    val merged =
      try spark.read.parquet(countsPath(statePath)).unionByName(inc)
        .groupBy("event_type", "hour").agg(sum("n").as("n"))
      catch { case _: Throwable => inc }
    // materialize BEFORE the overwrite: the merged plan reads the same
    // parquet dir it is about to replace
    val snap = graft.operators.Stage.snap(merged, materialize = true)
    snap.write.mode("overwrite").parquet(countsPath(statePath))
    spark.range(1).select(lit(batchId).as("batch_id"))
      .write.mode("overwrite").parquet(metaPath(statePath))
  }

  /** Current anomaly scores over the maintained state — identical output
    * contract to [[Temporal.rateAnomaly]]. */
  def scores(spark: SparkSession, statePath: String,
      trailing: Int = 24): DataFrame =
    Temporal.rateAnomalyFromHourly(
      spark.read.parquet(countsPath(statePath)), trailing)

  /** Start an AvailableNow monitoring pass of `events` (raw event rows
    * with ts + event_type) into the state at `statePath`. */
  def start(events: DataFrame, statePath: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(statePath, batch.toDF(), batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
