package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed table — the "what
  * changed between dataset releases" primitive a training-data pipeline
  * runs before shipping: which documents were added, removed, or
  * edited since the last cut (and therefore which downstream shards,
  * dedup indexes and embedding cells need refreshing).
  *
  * Scale posture: each side reduces to (key, content-hash) IN THE SCAN
  * STAGE — sha256 over the null-sentinel'd compare columns is computed
  * map-side, so the one full-outer shuffle carries two narrow columns,
  * never document payloads. At 100 TB the join cost is the key
  * cardinality; if both snapshots share a bucketed layout
  * ([[Bucketing]]) even that shuffle disappears. The hash is plain
  * sha256-hex of a U+0001-joined column list (nulls -> U+0000
  * sentinel), chosen over a binary fingerprint because every engine —
  * including the DuckDB oracle (`concat_ws(chr(1), ...)`) — reproduces
  * it byte-for-byte.
  */
object TableDiff {

  private def hashed(df: DataFrame, key: String, cols: Seq[String],
      as: String): DataFrame =
    df.select(col(key),
      sha2(concat_ws("\u0001", cols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*), 256).as(as))

  /** Per-key delta rows: (key, status in added|removed|changed,
    * before_hash, after_hash). Unchanged keys are dropped unless
    * `keepUnchanged` (then status `unchanged` appears too). Column
    * order in `cols` is part of the hash identity — keep it stable
    * across snapshots. */
  def diff(before: DataFrame, after: DataFrame, key: String,
      cols: Seq[String], keepUnchanged: Boolean = false): DataFrame = {
    val b = hashed(before, key, cols, "before_hash")
    val a = hashed(after, key, cols, "after_hash")
    val joined = b.join(a, Seq(key), "full_outer")
      .withColumn("status",
        when(col("before_hash").isNull, lit("added"))
          .when(col("after_hash").isNull, lit("removed"))
          .when(col("before_hash") =!= col("after_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(col(key), col("status"), col("before_hash"), col("after_hash"))
    if (keepUnchanged) joined else joined.where(col("status") =!= "unchanged")
  }

  /** The release-note card: row counts per status (unchanged included —
    * its size is the stability signal reviewers look at first). */
  def diffSummary(before: DataFrame, after: DataFrame, key: String,
      cols: Seq[String]): DataFrame =
    diff(before, after, key, cols, keepUnchanged = true)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
}
