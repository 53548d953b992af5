package graft.lifecycle

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

import graft.store.{EnsureStoreVectorStore, ParquetVectorStore}

/** Full teardown of a work dir — the reference's `uninstall.php:212-218`
  * per-site flow, surface for surface:
  *
  *   1. unschedule all recurring hooks (`:84-115`)  → the watermark file,
  *      the only persisted scheduler state here (a tick reads it to plan;
  *      no file, no pending schedule);
  *   2. optional best-effort remote purge through every enabled adapter
  *      (`:164-207`, gated on `wcvec_uninstall_remote_purge`) — each
  *      adapter wrapped in its own catch so one failing can't block the
  *      teardown;
  *   3. drop the sync table (`:117-125`, `wcvec_objects`) → `sync_state`;
  *   4. delete all options (`:127-139`) → the store dirs, which hold the
  *      engine's equivalent durable config+data state (`_MANIFEST`,
  *      `_STORE_ID`);
  *   5. delete the log dir (`:141-158`, uploads/wcvec JSONL) → `events`,
  *      best-effort, then remove the now-empty work dir itself (the
  *      reference's trailing `@rmdir`).
  *
  * Idempotent: uninstalling an absent or already-uninstalled work dir is a
  * no-op, and a fresh sync into the same path bootstraps from scratch
  * (spec-asserted).
  */
object Uninstall {

  /** The work-dir surfaces a full install can create, in teardown order. */
  private val Surfaces =
    Seq("last_scan_gmt", "sync_state", "store", "store_vs", "events")

  /** Tear down `work`. Returns the surfaces actually removed (a subset of
    * watermark/sync_state/store/store_vs/events — absent ones are
    * skipped, as `DROP TABLE IF EXISTS` / `delete_option` are no-ops). */
  def uninstall(spark: SparkSession, work: String,
      purgeRemote: Boolean = false, siteId: Int = 1): Seq[String] = {
    val root = Paths.get(work)
    if (!Files.exists(root)) return Nil

    // 2 — before any local state is dropped, while adapter config exists
    if (purgeRemote) {
      if (Files.exists(root.resolve("store")))
        try new ParquetVectorStore(spark, s"$work/store").purgeSite(siteId)
        catch { case _: Exception => () } // best-effort (`:190-203`)
      if (Files.exists(root.resolve("store_vs")))
        try new EnsureStoreVectorStore(spark, s"$work/store_vs").purgeSite(siteId)
        catch { case _: Exception => () }
    }

    val removed = Surfaces.flatMap { name =>
      val p = root.resolve(name)
      if (deleteRecursively(p)) Some(if (name == "last_scan_gmt") "watermark" else name)
      else None
    }

    // the reference's trailing best-effort `@rmdir`: only an empty dir goes
    try Files.deleteIfExists(root)
    catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    removed
  }

  /** Delete a file or directory tree; true iff something was removed.
    * Scoped to the named work-dir surfaces above — never called on an
    * arbitrary path. */
  private def deleteRecursively(p: Path): Boolean = {
    if (!Files.exists(p)) return false
    if (Files.isDirectory(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    } else Files.deleteIfExists(p)
    true
  }
}
