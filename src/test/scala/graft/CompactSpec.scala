package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.operators.Compact

/** Compaction contracts: content neutrality, victim selection (only
  * offending partitions rewrite — untouched partitions keep their
  * exact files), idempotence, and crash recovery from the trash hold. */
class CompactSpec extends SparkSpec {

  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("compact_").toString
    val df = (1 to 2000)
      .map(i => (i.toLong, s"t${i % 4}", (i * 7 % 1000).toLong))
      .toDF("id", "etype", "cents")
    // 16 writer tasks x 4 partitions → ~16 files per partition
    df.repartition(16).write.mode("overwrite")
      .partitionBy("etype").parquet(dir)
    // one extra, already-small partition
    Seq((9001L, "t9", 5L)).toDF("id", "etype", "cents")
      .write.mode("append").partitionBy("etype").parquet(dir)
    dir
  }

  private def filesOf(dir: String, part: String): Set[String] = {
    val p = new Path(s"$dir/etype=$part")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
  }

  test("compaction is content-neutral and packs victims to the target file count") {
    val dir = mkTable()
    val before = spark.read.parquet(dir).collect().toSet
    val census = Compact.fileStats(spark, dir, "etype").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert((0 to 3).forall(i => census(s"t$i") > 4), s"fixture too small: $census")

    val smallFiles = filesOf(dir, "t9")
    val report = Compact.compact(spark, dir, "etype", maxFiles = 4, targetFiles = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(report.map(_._1).toSet == Set("t0", "t1", "t2", "t3"),
      s"wrong victim set: ${report.mkString(", ")}")
    assert(report.forall { case (_, b, a) => b > 4 && a <= 2 && a >= 1 },
      s"bad packing: ${report.mkString(", ")}")

    // content identical; the small partition's files untouched
    assert(spark.read.parquet(dir).collect().toSet == before)
    assert(filesOf(dir, "t9") == smallFiles, "non-victim partition was rewritten")

    // idempotent: nothing left over the threshold
    assert(Compact.compact(spark, dir, "etype", maxFiles = 4, targetFiles = 2)
      .count() == 0)
  }

  test("recover restores a partition stranded in the trash hold mid-publish") {
    val dir = mkTable()
    val before = spark.read.parquet(dir)
      .where(col("etype") === "t1").collect().toSet
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between hold and publish: live dir moved to
    // trash, compacted replacement never landed
    val trash = new Path(dir, "_compact_trash_dead")
    fs.mkdirs(trash)
    fs.rename(new Path(dir, "etype=t1"), new Path(trash, "etype=t1"))
    assert(spark.read.parquet(dir).where(col("etype") === "t1").count() == 0)

    val restored = Compact.recover(spark, dir, "etype")
    assert(restored == Seq("t1"), s"restored=$restored")
    assert(spark.read.parquet(dir).where(col("etype") === "t1")
      .collect().toSet == before)
    // work dirs cleared
    assert(!fs.exists(trash))
  }
}
