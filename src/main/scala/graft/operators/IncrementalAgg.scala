package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Incrementally-maintained aggregate table (a materialized GROUP BY
  * view): per-key count/sum/min/max over an append-only fact, kept
  * current by merging each new batch's PARTIAL aggregate into the
  * persisted state — history is never rescanned.
  *
  * This is the batch half of what the streaming operators already do
  * with state stores, made a first-class table: at 100 TB the daily
  * "recompute the rollup" job pays a full-corpus scan per day, while
  * this pays one scan of the DAY's rows plus a keyed merge whose both
  * sides are key-cardinality-sized — the classic incremental
  * view-maintenance win for distributive aggregates (count/sum/min/max
  * merge associatively; avg derives as sum/cnt at read time).
  *
  * Durability discipline is [[StateCommit]]'s, with the version doing
  * double duty as the last-applied batch id (the
  * [[graft.streaming.StreamingMonitor]] replay-guard pattern):
  *
  *   - `ingest(batchId = v)` is a no-op when `v <= currentVersion` —
  *     a replayed or duplicate batch never double-counts;
  *   - the merge plan reads `snap-(v-1)` and writes `snap-v`, so there
  *     is no read-own-overwrite hazard;
  *   - the commit is one atomic pointer swap — readers see batch v's
  *     state in full or not at all.
  *
  * Scale posture: the batch partial is a map-side-combinable groupBy of
  * the BATCH only; the merge is one full-outer join keyed on the group
  * columns, both sides ~|keys| (the state table never grows past key
  * cardinality); nothing rescans prior batches. Value columns are
  * BIGINT fixed-point (the engine-wide exact-money discipline), so
  * merge order cannot drift a float sum — batch-order independence is
  * spec-gated.
  */
object IncrementalAgg {

  private val Aggs = "aggs"

  /** Per-value-column metric names in the state schema. */
  private def cols(v: String) = (s"sum_$v", s"min_$v", s"max_$v")

  /** The committed state: (keys..., cnt, sum_/min_/max_ per value col).
    * None before the first ingest. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    StateCommit.currentVersion(spark, root).map { v =>
      spark.read.parquet(StateCommit.tableDir(root, v, Aggs))
    }

  /** Last applied batch id (0 before the first ingest). */
  def lastBatch(spark: SparkSession, root: String): Long =
    StateCommit.currentVersion(spark, root).getOrElse(0L)

  private def partialOf(batch: DataFrame, keys: Seq[String],
      values: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("cnt") +:
      values.flatMap { v =>
        val (s, mn, mx) = cols(v)
        Seq(sum(col(v).cast("long")).as(s),
          min(col(v).cast("long")).as(mn),
          max(col(v).cast("long")).as(mx))
      }
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def merged(state: DataFrame, partial: DataFrame,
      keys: Seq[String], values: Seq[String]): DataFrame = {
    val s = state.select(col("cnt").as("a_cnt") +: (keys.map(col) ++
      values.flatMap { v =>
        val (su, mn, mx) = cols(v)
        Seq(col(su).as(s"a_$su"), col(mn).as(s"a_$mn"), col(mx).as(s"a_$mx"))
      }): _*)
    val p = partial.select(col("cnt").as("b_cnt") +: (keys.map(col) ++
      values.flatMap { v =>
        val (su, mn, mx) = cols(v)
        Seq(col(su).as(s"b_$su"), col(mn).as(s"b_$mn"), col(mx).as(s"b_$mx"))
      }): _*)
    def zsum(a: String, b: String) =
      coalesce(col(a), lit(0L)) + coalesce(col(b), lit(0L))
    s.join(p, keys, "full_outer")
      .select(keys.map(col) ++ (zsum("a_cnt", "b_cnt").as("cnt") +:
        values.flatMap { v =>
          val (su, mn, mx) = cols(v)
          Seq(zsum(s"a_$su", s"b_$su").as(su),
            least(col(s"a_$mn"), col(s"b_$mn")).as(mn),
            greatest(col(s"a_$mx"), col(s"b_$mx")).as(mx))
        }): _*)
  }

  /** Fold `batch` (the NEW rows only — batches are append-only slices
    * of the fact) into the maintained aggregate, publishing atomically
    * as batch `batchId`. Batch ids must be strictly increasing;
    * re-delivery of an applied id is a guarded no-op. Returns true when
    * the batch was applied. */
  def ingest(spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], values: Seq[String], batchId: Long): Boolean = {
    val cur = lastBatch(spark, root)
    if (batchId <= cur) return false // replay — already folded in
    val partial = partialOf(batch, keys, values)
    val next = read(spark, root) match {
      case Some(state) => merged(state, partial, keys, values)
      case None => partial
    }
    next.write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, batchId, Aggs))
    StateCommit.commit(spark, root, batchId)
    true
  }

  /** The maintained view with derived averages (sum div cnt, exact
    * BIGINT) — what a reader queries instead of the 100 TB fact. */
  def view(spark: SparkSession, root: String,
      values: Seq[String]): DataFrame = {
    val state = read(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed aggregate at $root"))
    values.foldLeft(state) { (df, v) =>
      df.withColumn(s"avg_$v", expr(s"sum_$v div cnt"))
    }
  }
}
