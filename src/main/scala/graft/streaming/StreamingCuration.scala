package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dedup

/** Streaming ingestion FILTER — online dedup at ingest: each micro-batch
  * of documents gets an exact/near-dup verdict against the corpus state
  * accumulated so far ([[Dedup.incrementalDedupAgainstKeys]]), then its
  * own keys fold into that state. The production shape of "don't let a
  * crawler re-ingest what the corpus already holds" — the corpus never
  * exists here as raw documents, only as its sha / band-signature key
  * sets.
  *
  * Batch semantics are [[Dedup.incrementalDedup]]'s: a batch is judged
  * against the state BEFORE it, so duplicates WITHIN one micro-batch are
  * not flagged against each other (they fold into state together; the
  * batch-local pass is [[Dedup.exact]]'s job at release time).
  *
  * Replay safety: `foreachBatch` is at-least-once, so the state records
  * the last applied batch id and a replayed batch is a no-op; verdicts
  * write to a per-batch-id directory with overwrite, so a replayed
  * partial write converges instead of duplicating (the
  * [[StreamingMonitor]] / [[StreamingSync]] design).
  *
  * Scale posture: state is the distinct key sets — bounded by corpus
  * CONTENT diversity, not ingest volume (a re-crawl adds nothing); each
  * batch pays two narrow left-semi joins keyed on hashes plus one
  * union-distinct state merge. Raw text never enters the state.
  */
object StreamingCuration {

  private def shasPath(p: String) = s"$p/shas"
  private def sigsPath(p: String) = s"$p/sigs"
  private def verdictsPath(p: String) = s"$p/verdicts"
  private def metaPath(p: String) = s"$p/meta"

  private def lastApplied(spark: SparkSession, statePath: String): Long =
    try spark.read.parquet(metaPath(statePath))
      .agg(max("batch_id")).head.getLong(0)
    catch { case _: Throwable => -1L }

  private def readOr(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    try spark.read.parquet(path)
    catch {
      case _: Throwable =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
    }

  private val ShaSchema = StructType(Seq(StructField("h", StringType)))
  private val SigSchema = StructType(Seq(
    StructField("band", LongType), StructField("sig", StringType)))

  /** Judge one micro-batch against the accumulated state, record its
    * verdicts, fold its keys in. Idempotent per `batchId`. */
  def applyBatch(statePath: String, batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batchId <= lastApplied(spark, statePath)) return
    val curSha = readOr(spark, shasPath(statePath), ShaSchema)
    val curSigs = readOr(spark, sigsPath(statePath), SigSchema)
    Dedup.incrementalDedupAgainstKeys(batch, curSha, curSigs)
      .write.mode("overwrite")
      .parquet(s"${verdictsPath(statePath)}/batch_id=$batchId")
    // materialize the merged key sets BEFORE overwriting the dirs the
    // merge plan reads from (the StreamingMonitor lesson)
    val newSha = graft.operators.Stage.snap(
      curSha.unionByName(Dedup.contentShas(batch).select("h")).distinct(),
      materialize = true)
    val newSigs = graft.operators.Stage.snap(
      curSigs.unionByName(Dedup.lshBands(batch).select("band", "sig"))
        .distinct(), materialize = true)
    newSha.write.mode("overwrite").parquet(shasPath(statePath))
    newSigs.write.mode("overwrite").parquet(sigsPath(statePath))
    spark.range(1).select(lit(batchId).as("batch_id"))
      .write.mode("overwrite").parquet(metaPath(statePath))
  }

  /** All recorded verdicts (doc_id, status, batch_id). */
  def verdicts(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(verdictsPath(statePath))

  /** Start an AvailableNow ingestion pass of `documents` (doc_id + text
    * rows) through the filter at `statePath`. */
  def start(documents: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    documents.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(statePath, batch.toDF(), batchId)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
