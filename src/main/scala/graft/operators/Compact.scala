package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for hive-partitioned parquet tables — the
  * maintenance job every streaming-ingested layout needs: micro-batch
  * appends and dynamic partition overwrites accumulate files per
  * partition until footer/list overhead dominates the scan (the
  * classic small-files problem), and compaction bin-packs each
  * offending partition back to a few right-sized files WITHOUT
  * changing content.
  *
  * Scale posture: the census is metadata-only (one directory listing);
  * the rewrite reads ONLY victim partitions (an `isin` partition-pruned
  * scan) and lands each victim in `targetFiles` files via one
  * shuffle keyed on (partition, salt). Partition count bounds the
  * driver-side loop — metadata-scale, never data-scale.
  *
  * Publication discipline (plain paths have no snapshot pointer, so
  * [[graft.streaming.StateCommit]]'s swap is not available): per
  * victim partition, the live directory is first RENAMED into a trash
  * hold, then the compacted directory renamed into place — two atomic
  * renames per partition. A crash between them leaves that partition's
  * data intact in the hold; [[recover]] restores any held partition
  * whose publish never landed, and a replayed [[compact]] converges
  * (compacted partitions are no longer victims). Underscore-prefixed
  * work dirs are invisible to Spark's parquet listing, so readers
  * never see staged or held files. Tables needing stronger atomicity
  * belong in a StateCommit root ([[AnnIndex]]-style versioned
  * generations) — this operator serves the plain layouts everything
  * else produces.
  */
object Compact {

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
    fs.listStatus(dir).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))

  /** Per-partition file census: (<pcol>, n_files, bytes). Metadata only. */
  def fileStats(spark: SparkSession, path: String, pcol: String): DataFrame = {
    val (fs, p) = fsOf(spark, path)
    val rows = fs.listStatus(p).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith(s"$pcol="))
      .map { d =>
        val files = dataFiles(fs, d.getPath)
        (d.getPath.getName.stripPrefix(s"$pcol="),
          files.length, files.map(_.getLen).sum)
      }
    spark.createDataFrame(rows).toDF(pcol, "n_files", "bytes")
  }

  /** Bin-pack every partition holding more than `maxFiles` files down
    * to `targetFiles`. Returns the report (<pcol>, files_before,
    * files_after) for the victims. Content-neutral (spec-gated) and
    * idempotent. */
  def compact(spark: SparkSession, path: String, pcol: String,
      maxFiles: Int = 8, targetFiles: Int = 1): DataFrame = {
    require(targetFiles >= 1 && maxFiles >= targetFiles,
      s"need maxFiles >= targetFiles >= 1, got $maxFiles/$targetFiles")
    val before = fileStats(spark, path, pcol).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val victims = before.collect { case (v, n) if n > maxFiles => v }.toSeq.sorted
    if (victims.nonEmpty) {
      val (fs, _) = fsOf(spark, path)
      val nonce = java.util.UUID.randomUUID.toString.take(8)
      val tmp = new Path(path, s"_compact_tmp_$nonce")
      val trash = new Path(path, s"_compact_trash_$nonce")
      fs.mkdirs(trash)

      val df = spark.read.parquet(path).where(col(pcol).isin(victims: _*))
      val salt = pmod(xxhash64(struct(df.columns.map(col): _*)),
        lit(targetFiles.toLong))
      // explicit partition count: AQE's partition coalescing would
      // otherwise merge the salted buckets back into one task and
      // defeat targetFiles > 1. A hash collision between two
      // (partition, salt) buckets can still under-shoot (≤ targetFiles
      // files, one up to 2× target size) — never over.
      df.repartition(victims.size * targetFiles, col(pcol), salt)
        .write.mode("overwrite").partitionBy(pcol).parquet(tmp.toString)

      victims.foreach { v =>
        val live = new Path(path, s"$pcol=$v")
        val staged = new Path(tmp, s"$pcol=$v")
        val held = new Path(trash, s"$pcol=$v")
        if (fs.exists(staged)) {
          // both renames are CHECKED: a false return (e.g. the live dir
          // recreated by a concurrent writer between the two renames)
          // must not fall through to the trash delete below — that
          // would permanently drop the only copy of the old partition.
          // On failure the hold (if it landed) stays on disk for
          // [[recover]], and the compact fails loudly.
          if (!fs.rename(live, held)) // 1: hold the old generation
            throw new IllegalStateException(
              s"compact: holding $live as $held failed — aborting; " +
                s"run Compact.recover to clear work dirs")
          if (!fs.rename(staged, live)) // 2: publish the compacted one
            throw new IllegalStateException(
              s"compact: publishing $staged over $live failed — old " +
                s"data held at $held; run Compact.recover to restore")
        }
      }
      fs.delete(trash, true)
      fs.delete(tmp, true)
    }
    val after = fileStats(spark, path, pcol)
    val s = spark
    import s.implicits._
    after.join(victims.map(v => (v, before(v))).toDF(pcol, "files_before"), pcol)
      .select(col(pcol), col("files_before"), col("n_files").as("files_after"))
      .orderBy(pcol)
  }

  /** Crash recovery: restore every partition still sitting in a trash
    * hold whose live directory is missing (a crash between hold and
    * publish), then clear leftover work dirs. Returns restored
    * partition values. */
  def recover(spark: SparkSession, path: String, pcol: String): Seq[String] = {
    val (fs, p) = fsOf(spark, path)
    val restored = fs.listStatus(p).toSeq
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("_compact_trash_"))
      .flatMap { t =>
        fs.listStatus(t.getPath).toSeq
          .filter(d => d.isDirectory && d.getPath.getName.startsWith(s"$pcol="))
          .flatMap { held =>
            val live = new Path(p, held.getPath.getName)
            if (!fs.exists(live)) {
              fs.rename(held.getPath, live)
              Some(held.getPath.getName.stripPrefix(s"$pcol="))
            } else None
          }
      }
    fs.listStatus(p).toSeq
      .filter(d => d.getPath.getName.startsWith("_compact_tmp_") ||
        d.getPath.getName.startsWith("_compact_trash_"))
      .foreach(d => fs.delete(d.getPath, true))
    restored.sorted
  }
}
