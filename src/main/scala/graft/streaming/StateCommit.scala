package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import scala.util.Try

import org.apache.hadoop.fs.{CreateFlag, FileContext, Path}
import org.apache.hadoop.fs.Options.{CreateOpts, Rename}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-table state commits for the foreachBatch operators
  * ([[StreamingMonitor]], [[StreamingCuration]]).
  *
  * The round-6 advisory problem: committing state as N independent
  * `mode("overwrite")` parquet writes plus a batch-id meta write is not
  * atomic — a crash between any two leaves the tables at batch B+1 with
  * the meta at B (or half the tables new, half old), so the replayed
  * batch double-applies and the documented replay-idempotence contract
  * breaks.
  *
  * Fix, the write-ahead-snapshot / pointer-swap design Spark's own
  * `FileContextBasedCheckpointFileManager` uses for streaming metadata:
  *
  *   - every table of batch B's state is written under a fresh
  *     `snap-B/` directory that nothing references yet — a crash at any
  *     point here is invisible (the replay overwrites the same dir);
  *   - the commit is ONE metadata operation: write `CURRENT.tmp`, then
  *     `FileContext.rename(…, Rename.OVERWRITE)` onto `CURRENT` — atomic
  *     on HDFS and on POSIX local filesystems (object stores with
  *     non-atomic rename need their usual metadata-log mitigation, same
  *     caveat as Spark's checkpoints);
  *   - readers resolve `CURRENT` first, so they see batch B's state in
  *     full or not at all;
  *   - committed snapshots older than the previous one are GC'd (the
  *     previous survives one round for in-flight readers holding its
  *     paths in lazy plans).
  *
  * A side benefit: the merge plan for batch B+1 reads `snap-B/` and
  * writes `snap-B+1/`, so the read-own-overwrite hazard the old code
  * dodged with an eager materialization is gone structurally.
  */
object StateCommit {

  private val Pointer = "CURRENT"
  private val SnapPrefix = "snap-"

  private def fc(spark: SparkSession, root: Path): FileContext =
    FileContext.getFileContext(root.toUri,
      spark.sparkContext.hadoopConfiguration)

  /** Directory for `table` of the snapshot committed (or being built)
    * for batch `v`. */
  def tableDir(statePath: String, v: Long, table: String): String =
    s"$statePath/$SnapPrefix$v/$table"

  /** The committed version (last applied batch id), if any commit has
    * completed. */
  def currentVersion(spark: SparkSession, statePath: String): Option[Long] = {
    val root = new Path(statePath)
    Try {
      val in = fc(spark, root).open(new Path(root, Pointer))
      try {
        // read to EOF — a single read() may legally return a short count,
        // which would mis-parse the version and silently treat prior
        // state as absent (round-8 advisory)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }.toOption
  }

  /** Read `table` from the committed snapshot; None before the first
    * commit. */
  def readTable(spark: SparkSession, statePath: String,
      table: String): Option[DataFrame] =
    currentVersion(spark, statePath).map { v =>
      spark.read.parquet(tableDir(statePath, v, table))
    }

  /** Atomically publish batch `v`'s snapshot (all its tables must
    * already be written under [[tableDir]]) and GC snapshots older than
    * the one being replaced. */
  def commit(spark: SparkSession, statePath: String, v: Long): Unit = {
    val root = new Path(statePath)
    val ctx = fc(spark, root)
    val prev = currentVersion(spark, statePath)
    val tmp = new Path(root, s"$Pointer.tmp")
    val out = ctx.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      CreateOpts.createParent())
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ctx.rename(tmp, new Path(root, Pointer), Rename.OVERWRITE)
    // GC: anything older than the snapshot just superseded. `prev`
    // itself survives one round for readers still holding its paths.
    for (p <- prev; st <- Try(ctx.util.listStatus(root)).toOption; s <- st) {
      val name = s.getPath.getName
      if (name.startsWith(SnapPrefix))
        Try(name.stripPrefix(SnapPrefix).toLong).toOption match {
          case Some(old) if old < p => ctx.delete(s.getPath, true)
          case _ => ()
        }
    }
  }
}
