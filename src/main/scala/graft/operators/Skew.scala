package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation strategies for hot keys — the manual fallbacks when
  * AQE's runtime skew-join split (`spark.sql.adaptive.skewJoin`) cannot
  * apply: aggregations (AQE only splits joins), stateful streaming, or
  * a key so hot one task still exceeds the split threshold.
  *
  * Both forms preserve EXACT result equality with their plain
  * counterparts (spec-asserted on adversarially skewed data) — the salt
  * only changes physical placement, never logical grouping:
  *
  *  - [[saltedJoin]]: the big side computes a deterministic salt in
  *    [0, salts); the small side replicates `salts`-ways. Every big row
  *    meets exactly the one replica carrying its salt, so the joined
  *    multiset is identical to the plain equi-join — but the shuffle
  *    partitions by (key, salt), spreading a hot key over `salts`
  *    tasks.
  *  - [[saltedAgg]]: two-phase aggregation — partial combinable
  *    aggregates per (key, salt), then the final merge per key. The
  *    second shuffle moves at most `salts` rows per key regardless of
  *    how hot the key was.
  *
  * The salt is `xxhash64` of the whole row (deterministic, no RNG
  * state): reproducible across retries and engines, and uniform enough
  * to split a hot key. At 100 TB the knob that matters is `salts` ≈
  * ceil(hottest-key rows / target-partition rows).
  */
object Skew {

  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))

  /** Inner equi-join on `key` with the big side salted and the small
    * side replicated. Output columns = big's then small's non-key
    * columns (the plain-join shape). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe count + sum over `valueCol` grouped by `key`:
    * phase 1 partially aggregates per (key, salt), phase 2 merges per
    * key. Results are BIGINT-exact and identical to the plain
    * `groupBy(key)` aggregation. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col(valueCol)).as("ps"))
      .groupBy(col(key))
      .agg(sum("pn").as("n"), sum("ps").as("s"))
  }
}
