package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{CdcBatch, DsirModel}

/** Streaming DSIR scoring — importance-weight every incoming micro-batch
  * against a FROZEN [[DsirModel]]: the production shape of
  * selection-at-ingest, where the model was fit once (on samples) and
  * the 100 TB firehose is scored as it lands rather than re-read later.
  *
  * Model pinning: [[start]] resolves the model version ONCE and every
  * batch of that sweep scores against it ([[DsirModel.scoreAt]]) — a
  * refit landing mid-sweep must not silently switch scoring regimes
  * between batch N and N+1. Each score row records its `model_v` so a
  * downstream selection can prove which regime produced it (and a new
  * sweep picks up the new version by restarting).
  *
  * Replay safety ([[StreamingCuration]] / [[StreamingMonitor]] design):
  * `foreachBatch` is at-least-once, so scores write to a per-batch-id
  * directory with overwrite (a replayed partial write converges) and
  * the applied-batch watermark advances by one atomic [[StateCommit]]
  * pointer swap AFTER the write — a crash between the two replays
  * cleanly. A CDC batch carrying several versions of one doc collapses
  * last-wins BEFORE scoring ([[CdcBatch.collapse]]) — without it the
  * two versions' gram bags merge into a chimera document whose weight
  * belongs to neither version.
  *
  * Scale posture: per batch, one hashed-gram pass over the batch plus a
  * broadcast join against the ≤buckets-row model — nothing corpus-sized
  * moves, no state grows beyond the applied-batch pointer. */
object StreamingDsir {

  private def scoresPath(p: String) = s"$p/scores"

  /** Score one micro-batch against the pinned model version; idempotent
    * per `batchId`. `seqCol` names the batch's CDC ordering column when
    * the feed carries one (recency, not payload order, picks the
    * surviving version of a doc edited twice in one trigger window). */
  def applyBatch(modelRoot: String, statePath: String, batch: DataFrame,
      batchId: Long, modelVersion: Long, seqCol: String = ""): Unit = {
    val spark = batch.sparkSession
    if (StateCommit.currentVersion(spark, statePath).exists(batchId <= _)) return
    val collapsed = CdcBatch.collapse(batch, "doc_id", seqCol)
    DsirModel.scoreAt(spark, modelRoot, collapsed, modelVersion)
      .withColumn("model_v", lit(modelVersion))
      .write.mode("overwrite")
      .parquet(s"${scoresPath(statePath)}/batch_id=$batchId")
    StateCommit.commit(spark, statePath, batchId)
  }

  /** All recorded scores (doc_id, n_grams, micro_logw, model_v,
    * batch_id). */
  def scores(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(scoresPath(statePath))

  private val PinMarker = "graft-dsir-model-pin"
  private val SweepMarker = "graft-dsir-sweep-id"

  private def readMarkerFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    if (fs.exists(p)) {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    } else None

  private def writeMarkerFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, false)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Guard the checkpoint↔statePath pairing (round-12 review): the
    * applied-batch watermark lives in `statePath` while batch ids come
    * from the CHECKPOINT — a fresh checkpoint restarts ids at 0, so
    * pairing it with a reused statePath made [[applyBatch]] silently
    * skip every batch at or under the old watermark (new documents
    * never scored, nothing failed). A sweep id minted once per
    * checkpoint lifetime is recorded in BOTH places; a mismatch — or a
    * fresh checkpoint against a statePath that already carries a
    * watermark — fails loudly instead. */
  private def requirePairing(spark: org.apache.spark.sql.SparkSession,
      statePath: String, checkpoint: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val ckptMarker = new org.apache.hadoop.fs.Path(checkpoint, SweepMarker)
    val fs = ckptMarker.getFileSystem(conf)
    val ckptExisted = fs.exists(
      new org.apache.hadoop.fs.Path(checkpoint, PinMarker))
    val ckptId = readMarkerFile(fs, ckptMarker).getOrElse {
      val id = java.util.UUID.randomUUID().toString
      writeMarkerFile(fs, ckptMarker, id)
      id
    }
    val stateMarker = new org.apache.hadoop.fs.Path(statePath, SweepMarker)
    val sfs = stateMarker.getFileSystem(conf)
    readMarkerFile(sfs, stateMarker) match {
      case Some(sid) if sid != ckptId =>
        throw new IllegalStateException(
          s"statePath $statePath belongs to sweep $sid but checkpoint " +
            s"$checkpoint carries sweep $ckptId — a fresh checkpoint " +
            "restarts batch ids at 0 and the existing watermark would " +
            "silently skip every new batch; resume the original " +
            "checkpoint or point the sweep at a fresh statePath")
      case Some(_) => ()
      case None =>
        val watermark = StateCommit.currentVersion(spark, statePath)
        if (!ckptExisted && watermark.nonEmpty)
          throw new IllegalStateException(
            s"statePath $statePath already carries an applied-batch " +
              s"watermark but checkpoint $checkpoint is fresh — batch " +
              "ids restart at 0 and every new batch would be silently " +
              "skipped; resume the sweep's original checkpoint or use " +
              "a fresh statePath")
        // PRE-UPGRADE adoption (round-12 advice): a checkpoint from
        // before the sweep-marker mechanism (PinMarker present, no
        // SweepMarker) paired with a pre-existing statePath used to be
        // adopted blind — the wrong statePath's higher watermark still
        // silently skipped every batch. Cross-check: a correctly paired
        // sweep has watermark == the checkpoint's last committed batch
        // id (or +1 for a crash between the state commit and Spark's
        // commit marker). Anything else means the two dirs never ran
        // together.
        if (ckptExisted && watermark.nonEmpty) {
          val wm = watermark.get
          val lastCommitted = scala.util.Try {
            fs.listStatus(new org.apache.hadoop.fs.Path(checkpoint, "commits"))
              .map(_.getPath.getName)
              .flatMap(n => scala.util.Try(n.toLong).toOption)
          }.toOption.toSeq.flatten.sorted.lastOption.getOrElse(-1L)
          if (wm != lastCommitted && wm != lastCommitted + 1)
            throw new IllegalStateException(
              s"statePath $statePath (applied-batch watermark $wm) does " +
                s"not pair with pre-upgrade checkpoint $checkpoint (last " +
                s"committed batch id $lastCommitted) — adopting the " +
                "mismatch would silently skip batches; resume the " +
                "sweep's original statePath or start fresh")
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"adopting pre-upgrade DSIR sweep pairing: checkpoint " +
              s"$checkpoint (last committed $lastCommitted) <-> statePath " +
              s"$statePath (watermark $wm); sweep id $ckptId minted")
        }
        sfs.mkdirs(new org.apache.hadoop.fs.Path(statePath))
        writeMarkerFile(sfs, stateMarker, ckptId)
    }
  }

  /** The sweep's model pin, persisted in the CHECKPOINT on first start
    * (the [[StreamingLex]] era-marker pattern): a crash-recovery restart
    * of the same checkpoint re-reads the recorded pin instead of
    * re-resolving CURRENT — a refit landing while the stream was down
    * must not switch scoring regimes mid-sweep (round-11 review: the
    * in-memory pin alone only survived within one process). */
  private def resolvePin(documents: DataFrame, modelRoot: String,
      checkpoint: String): Long = {
    val spark = documents.sparkSession
    val marker = new org.apache.hadoop.fs.Path(checkpoint, PinMarker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val pin =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      // round-12 review: with the default fit(retain = 2), two refits
      // landing mid-sweep expire the pinned snapshot — scoreAt would
      // fail on some arbitrary batch deep in the sweep. Surface the
      // retention problem AT RESTART with the remedy in the message.
      val retained = StateCommit.versions(spark, modelRoot)
      if (!retained.contains(pin))
        throw new IllegalStateException(
          s"pinned DSIR model v$pin at $modelRoot has been " +
            s"retention-expired (retained: ${retained.mkString(", ")}) — " +
            "raise DsirModel.fit(retain = ...) so sweeps outlive refits, " +
            "or restart the sweep with a fresh checkpoint to re-pin")
      pin
    } else {
      val v = DsirModel.version(spark, modelRoot)
      val out = fs.create(marker, false)
      try out.write(v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      v
    }
  }

  /** Start an AvailableNow scoring pass of `documents` (doc_id + text
    * rows) against the model at `modelRoot`, pinned for the whole sweep
    * — including across crash-recovery restarts of the same checkpoint
    * — to the version that was CURRENT at first start. */
  def start(documents: DataFrame, modelRoot: String, statePath: String,
      checkpoint: String, seqCol: String = ""): StreamingQuery = {
    requirePairing(documents.sparkSession, statePath, checkpoint)
    val pinned = resolvePin(documents, modelRoot, checkpoint)
    documents.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(modelRoot, statePath, batch.toDF(), batchId, pinned, seqCol)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
