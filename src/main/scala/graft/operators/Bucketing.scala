package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located fact⋈fact join: Spark's
  * bucketing writes each table pre-hash-partitioned on the join key
  * into N fixed buckets and records that layout in the catalog, so a
  * join of two tables bucketed the same way needs NO exchange on
  * either side — bucket i joins bucket i directly (plan-gated: zero
  * `Exchange hashpartitioning` under the join).
  *
  * This is the 100 TB answer for the joins that dominate this engine's
  * fact⋈fact work (orders⋈lineitem, chunk-delta, sync-state merge):
  * dimensions broadcast, but two petabyte facts joined repeatedly on
  * the same key should pay their shuffle ONCE at layout time, not per
  * query. The write itself costs one shuffle into the bucket layout —
  * amortized across every subsequent join, and at constant bucket
  * count the layout stays valid as data grows.
  *
  * Buckets also compose with the AnnIndex/VectorStore partition story:
  * bucket pruning on the key (`spark.sql.sources.bucketing.enabled`,
  * on by default) gives point lookups file-level pruning inside each
  * partition.
  *
  * Mechanics note: bucketing metadata lives in the session catalog, so
  * the write is `saveAsTable` (with an explicit external `path`), not
  * a bare parquet directory — a path-only read would lose the bucket
  * spec and silently reintroduce the shuffle (spec guards the
  * bucketed-vs-path plan difference).
  */
object Bucketing {

  /** Write `df` as external table `table` at `path`, bucketed on `key`
    * into `nBuckets`, sorted within buckets by the key (sorted buckets
    * let sort-merge join skip its sort too). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — returns the
    * plain inner equi-join; the bucket layout makes it exchange-free. */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
