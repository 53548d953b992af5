package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.fs.{CreateFlag, FileContext, Path}
import org.apache.hadoop.fs.Options.{CreateOpts, Rename}
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
  * `base-version + batchId + 1`, refusing versions at or below the
  * committed one — a replayed batch is a no-op, so generations are
  * never double-counted (and [[graft.operators.LexIndex.ingest]]'s
  * exactness spec keeps incremental ≡ rebuild row-for-row).
  *
  * The base version is PERSISTED in the checkpoint directory on first
  * start and read back on every restart: with a resumed checkpoint the
  * stream's batch ids continue where they left off, so re-deriving the
  * base from the CURRENT committed index version would compute
  * `expectedVersion = newBase + batchId + 1` past `committed + 1` and
  * fail the ingest's contiguity check — the round-9 advisory. The
  * version arithmetic must anchor to the base the checkpoint's batch
  * ids started from, which is exactly what the checkpoint file records
  * (same atomic create-then-rename publication as [[StateCommit]]).
  */
object StreamingLex {

  private val BaseFile = "graft-lex-base"

  /** The base version batch-id arithmetic anchors to: read from the
    * checkpoint if this stream has started before, else computed and
    * atomically persisted there. An explicit `baseVersion` (operator
    * override, e.g. checkpoint surgery) wins and is recorded. */
  private def anchoredBase(spark: SparkSession, checkpoint: String,
      explicit: Option[Long], current: => Long): Long = {
    val root = new Path(checkpoint)
    val ctx = FileContext.getFileContext(root.toUri,
      spark.sparkContext.hadoopConfiguration)
    val file = new Path(root, BaseFile)
    def read(): Option[Long] = scala.util.Try {
      val in = ctx.open(file)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }.toOption
    def write(v: Long): Unit = {
      val tmp = new Path(root, s"$BaseFile.tmp")
      val out = ctx.create(tmp,
        EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        CreateOpts.createParent())
      try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      ctx.rename(tmp, file, Rename.OVERWRITE)
    }
    explicit match {
      case Some(v) => write(v); v
      case None => read().getOrElse { val v = current; write(v); v }
    }
  }

  /** Start an AvailableNow maintenance pass of `docs` (batches of new
    * documents with `doc_id`/`text`) into the index at `root`, which
    * must already be built. `baseVersion` overrides the anchored base
    * (recorded in the checkpoint; defaults to the committed version on
    * FIRST start and to the recorded value on every resume). */
  def start(docs: DataFrame, root: String, checkpoint: String,
      baseVersion: Option[Long] = None): StreamingQuery = {
    val spark = docs.sparkSession
    val base = anchoredBase(spark, checkpoint, baseVersion,
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
