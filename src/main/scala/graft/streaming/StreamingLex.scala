package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.LexIndex

/** Streaming maintenance of the [[LexIndex]] inverted index: each
  * micro-batch of NEW documents lands as one immutable generation with
  * algebraically-merged df/corpus stats, so the searchable index stays
  * current without ever rescanning the corpus.
  *
  * Exactly-once state from at-least-once delivery, the
  * [[StreamingAgg]] discipline: Structured Streaming re-delivers a
  * failed batch UNDER THE SAME ID, and the ingest commits as version
  * `build-version + batchId + 1`, refusing versions at or below the
  * committed one — a replayed batch is a no-op, so generations are
  * never double-counted (and [[graft.operators.LexIndex.ingest]]'s
  * exactness spec keeps incremental ≡ rebuild).
  */
object StreamingLex {

  /** Start an AvailableNow maintenance pass of `docs` (batches of new
    * documents with `doc_id`/`text`) into the index at `root`, which
    * must already be built. `baseVersion` is the committed version the
    * stream starts from (defaults to the current one at start). */
  def start(docs: DataFrame, root: String, checkpoint: String,
      baseVersion: Option[Long] = None): StreamingQuery = {
    val spark = docs.sparkSession
    val base = baseVersion.getOrElse(
      graft.streaming.StateCommit.currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(
          s"no committed lexical index at $root — build before streaming")))
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        LexIndex.ingestAs(batch.sparkSession, batch.toDF(), root,
          expectedVersion = base + batchId + 1)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Read-side convenience: BM25 top-k over the maintained index. */
  def search(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 10): DataFrame = LexIndex.search(spark, root, terms, k)
}
