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
  def commit(spark: SparkSession, statePath: String, v: Long): Unit =
    commit(spark, statePath, v, retain = 2)

  /** [[commit]] with an explicit retention horizon: the `retain` newest
    * committed snapshots survive (the default 2 = the new one plus its
    * predecessor, which lives one round for in-flight readers holding
    * its paths in lazy plans); older ones GC. A larger horizon buys
    * TIME TRAVEL — [[readTableAt]] serves any retained version — at
    * the cost of `retain` copies of the (keyed, metadata-sized) state,
    * the Iceberg/Delta snapshot-expiry trade. */
  def commit(spark: SparkSession, statePath: String, v: Long,
      retain: Int): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val root = new Path(statePath)
    val ctx = fc(spark, root)
    val tmp = new Path(root, s"$Pointer.tmp")
    val out = ctx.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      CreateOpts.createParent())
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ctx.rename(tmp, new Path(root, Pointer), Rename.OVERWRITE)
    // GC: keep the `retain` newest committed (≤ v) snapshots. Anything
    // newer than v is some other writer's in-flight build — not ours to
    // judge, never deleted here.
    val committed = versions(spark, statePath)
    committed.sorted.reverse.drop(retain).foreach { old =>
      ctx.delete(new Path(root, s"$SnapPrefix$old"), true)
    }
  }

  /** Committed snapshot versions still on disk, ascending — the
    * time-travel horizon. Versions above CURRENT are in-flight builds,
    * not commits, and are excluded. */
  def versions(spark: SparkSession, statePath: String): Seq[Long] =
    currentVersion(spark, statePath) match {
      case None => Seq.empty
      case Some(cur) =>
        val root = new Path(statePath)
        Try(fc(spark, root).util.listStatus(root)).toOption.toSeq.flatten
          .map(_.getPath.getName)
          .filter(_.startsWith(SnapPrefix))
          .flatMap(n => Try(n.stripPrefix(SnapPrefix).toLong).toOption)
          .filter(_ <= cur)
          .sorted
    }

  /** Garbage-collect generation directories (`gen-<v>` under
    * `statePath`) that no COMMITTED snapshot's manifest references —
    * the shared reclaim pass of every generational index
    * ([[graft.operators.AnnIndex]]/AnnIndexPq/DedupIndex/LexIndex; all
    * four previously carried a private copy). The manifest table must
    * expose a BIGINT `gen` column.
    *
    * Fail-safe by construction: if ANY committed snapshot's manifest
    * cannot be read (transient storage error), the pass ABORTS without
    * deleting anything — defaulting an unreadable manifest to "refers
    * to nothing" would delete generations the current index still
    * needs. Snapshot dirs ABOVE the committed version are in-flight
    * builds and are skipped (their generations are `>= cur` and never
    * GC candidates anyway). Generations at or above the committed
    * version are never touched. */
  def gcGenerations(spark: SparkSession, statePath: String,
      manifestTable: String = "manifest"): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = Try(fs.listStatus(root).toSeq).getOrElse(return)
    val cur = currentVersion(spark, statePath).getOrElse(return)
    val committedSnaps = listed
      .filter(_.getPath.getName.startsWith(SnapPrefix))
      .filter(s => Try(s.getPath.getName.stripPrefix(SnapPrefix).toLong)
        .toOption.exists(_ <= cur))
    val referenced = scala.collection.mutable.Set.empty[Long]
    committedSnaps.foreach { s =>
      // layout probe by existence, not by catching AnalysisException —
      // a folded-meta snapshot (round 12: one `meta` parquet holds every
      // metadata-sized table, discriminated by column `t`) has no
      // per-table manifest dir, and exception-driven fallback spammed
      // a full PATH_NOT_FOUND stack into every commit's log.
      // FOLDED FIRST — the same precedence readers (LexIndex.metaTable)
      // use: a snapshot dir can legally carry BOTH layouts (a pre-fold
      // build attempt crashed before commit, then the same version was
      // rewritten post-fold — overwrite replaces meta/ but nothing
      // removes the stale per-table dir). GC consulting the STALE
      // manifest while readers follow the folded one would delete
      // generations the committed snapshot still references
      // (round-12 advice).
      // "folded" is decided by SCHEMA, not existence alone: PRE-fold
      // DedupIndex snapshots keep an unrelated params table also named
      // `meta` (no `t` discriminator column) — existence alone would
      // mis-read it and abort (fail-safe, but silently disabling that
      // family's GC). Post-fold (round 13) every family's meta carries
      // `t`.
      val perTable = new Path(s.getPath, manifestTable)
      val folded = new Path(s.getPath, "meta")
      val read = Try {
        val fm = if (fs.exists(folded))
          Some(spark.read.parquet(folded.toString)).filter(
            _.columns.contains("t"))
        else None
        fm match {
          case Some(m) =>
            m.where(org.apache.spark.sql.functions.col("t") === manifestTable)
              .select(org.apache.spark.sql.functions.col("gen").cast("long"))
              .collect().map(_.getLong(0))
          case None =>
            spark.read.parquet(perTable.toString)
              .select(org.apache.spark.sql.functions.col("gen").cast("long"))
              .collect().map(_.getLong(0))
        }
      }
      read match {
        case scala.util.Success(gs) => referenced ++= gs
        case scala.util.Failure(_) => return // abort: never guess
      }
    }
    listed.filter(_.getPath.getName.startsWith("gen-")).foreach { g =>
      Try(g.getPath.getName.stripPrefix("gen-").toLong).toOption.foreach {
        gv => if (gv < cur && !referenced(gv)) fs.delete(g.getPath, true)
      }
    }
  }

  /** Shared folded-metadata machinery (round 13): every persisted index
    * family (LexIndex/AnnIndex/AnnIndexPq/DedupIndex/DsirModel) commits
    * its metadata-sized tables as ONE `meta` parquet whose rows carry a
    * `t` discriminator column — N per-table coalesce(1) writes were N
    * driver-side committer rounds per mutation. Families differ only in
    * their column superset and logical-table column lists; the fold/read
    * shape lives here so the mixed-layout precedence rule has one edit
    * site (it previously had five drifting private copies).
    *
    * [[foldMetaRows]] projects one logical table's rows onto the
    * family's column superset (absent columns null-padded, every column
    * cast to its canonical type). */
  def foldMetaRows(t: String, df: DataFrame,
      metaCols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.columns.toSet
    df.select(lit(t).as("t") +: metaCols.map { case (c, tp) =>
      (if (have(c)) col(c) else lit(null)).cast(tp).as(c)
    }: _*)
  }

  /** Read one logical meta table of snapshot `v`: folded layout first,
    * per-table directory as the fallback for snapshots written by
    * pre-fold code (time travel across the upgrade keeps working).
    * "Folded" is decided by SCHEMA (`t` column present), not existence —
    * two families' PRE-fold layouts also kept a table named `meta`
    * (DedupIndex's k/r scheme, DsirModel's buckets/totals row), the same
    * discrimination [[gcGenerations]] applies. */
  def metaTable(spark: SparkSession, statePath: String, v: Long,
      table: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val metaPath = new Path(tableDir(statePath, v, "meta"))
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded =
      if (fs.exists(metaPath))
        Some(spark.read.parquet(metaPath.toString))
          .filter(_.columns.contains("t"))
      else None
    folded match {
      case Some(m) => m.where(col("t") === table).select(cols.map(col): _*)
      case None =>
        // project `cols` whenever the pre-fold snapshot has them all, so
        // positional readers see the SAME column order on both layouts;
        // raw only when some are missing (DsirModel's pre-totals meta is
        // the one genuinely narrower legacy schema) — round-13 advice
        val raw = spark.read.parquet(tableDir(statePath, v, table))
        if (cols.forall(raw.columns.contains)) raw.select(cols.map(col): _*)
        else raw
    }
  }

  /** Time travel: read `table` as of snapshot `v`. Fails loudly when
    * `v` was never committed or has been retention-GC'd — a silent
    * fallback to another version would be a correctness bug in any
    * downstream reproduction run. */
  def readTableAt(spark: SparkSession, statePath: String, table: String,
      v: Long): DataFrame = {
    requireRetained(spark, statePath, v)
    spark.read.parquet(tableDir(statePath, v, table))
  }

  /** The retained-snapshot guard every time-travel read shares (one
    * edit site for retention semantics and the error wording instead of
    * a copy per index family). */
  def requireRetained(spark: SparkSession, statePath: String,
      v: Long): Unit = {
    val have = versions(spark, statePath)
    require(have.contains(v),
      s"snapshot $v not available at $statePath (retained: ${have.mkString(", ")})")
  }
}
