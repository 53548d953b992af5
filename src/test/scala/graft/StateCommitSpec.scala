package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** [[StateCommit.gcGenerations]] layout-precedence contract (round-12
  * advice): GC must resolve the manifest through the SAME layout
  * precedence readers use — folded `meta` (discriminated by its `t`
  * column) first, per-table manifest only for pre-fold snapshots —
  * or a snapshot dir carrying both layouts (a pre-fold build attempt
  * crashed before commit, then the version was rewritten post-fold)
  * makes GC follow the STALE manifest and delete generations the
  * committed snapshot still references. */
class StateCommitSpec extends SparkSpec {
  import spark.implicits._

  private def commitPointer(root: String, v: Long): Unit =
    Files.writeString(java.nio.file.Paths.get(root, "CURRENT"), v.toString)

  private def genDirs(root: String): Seq[String] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).sorted.toSeq

  test("dual-layout snapshot: GC follows the folded meta, not the stale per-table manifest") {
    val root = Files.createTempDirectory("graft-scommit").toString
    // snap-5 carries BOTH layouts: the stale pre-fold manifest points at
    // gen-1; the committed folded meta points at gen-2
    Seq(1L).toDF("gen").write
      .parquet(StateCommit.tableDir(root, 5L, "manifest"))
    Seq(("manifest", 2L)).toDF("t", "gen").write
      .parquet(StateCommit.tableDir(root, 5L, "meta"))
    Seq(0L).toDF("x").write.parquet(s"$root/gen-1")
    Seq(0L).toDF("x").write.parquet(s"$root/gen-2")
    commitPointer(root, 5L)
    StateCommit.gcGenerations(spark, root)
    // gen-2 (folded-referenced) must survive; gen-1 (only the stale
    // manifest referenced it) is reclaimable
    assert(genDirs(root) == Seq("gen-2"), genDirs(root).toString)
  }

  test("a params table also named `meta` (no `t` column) does not shadow the per-table manifest") {
    // the DedupIndex shape: `meta` holds k/r params, the real manifest
    // is per-table — folded-layout detection must be by schema, not by
    // directory existence, or GC silently aborts for that family
    val root = Files.createTempDirectory("graft-scommit2").toString
    Seq(3L).toDF("gen").write
      .parquet(StateCommit.tableDir(root, 4L, "manifest"))
    Seq((16, 4)).toDF("k", "r").write
      .parquet(StateCommit.tableDir(root, 4L, "meta"))
    Seq(0L).toDF("x").write.parquet(s"$root/gen-2")
    Seq(0L).toDF("x").write.parquet(s"$root/gen-3")
    commitPointer(root, 4L)
    StateCommit.gcGenerations(spark, root)
    assert(genDirs(root) == Seq("gen-3"), genDirs(root).toString)
  }
}
