package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LexIndex

/** Streaming maintenance of the [[LexIndex]] inverted index: each
  * micro-batch of NEW documents lands as one immutable generation with
  * algebraically-merged df/corpus stats, so the searchable index stays
  * current without ever rescanning the corpus.
  *
  * Exactly-once state from at-least-once delivery: the stream's batch
  * id is the replay guard, and it is recorded INSIDE the index
  * snapshot ([[LexIndex.ingestBatch]]) — committed atomically with the
  * generation it guards, so a re-delivered batch is a converged no-op.
  * Because the guard is the batch WATERMARK rather than version
  * arithmetic over a remembered base, it stays correct when other
  * writers mutate the index between stream runs: a takedown
  * [[LexIndex.delete]] or a [[LexIndex.compactGenerations]] bumps the
  * committed version, and the next resumed batch still applies instead
  * of being mistaken for a replay (the round-10 review finding that
  * retired the checkpoint-anchored base of the first design — and with
  * it this file's hand-rolled copy of the StateCommit pointer I/O).
  *
  * [[LexIndex.build]] resets the watermark: resuming a stream across a
  * rebuild requires a fresh checkpoint (a new stream era).
  */
object StreamingLex {

  /** Start an AvailableNow maintenance pass of `docs` (batches of new
    * documents with `doc_id`/`text`) into the index at `root`, which
    * must already be built. */
  def start(docs: DataFrame, root: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        LexIndex.ingestBatch(batch.sparkSession, batch.toDF(), root, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Read-side convenience: BM25 top-k over the maintained index. */
  def search(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 10): DataFrame = LexIndex.search(spark, root, terms, k)
}
