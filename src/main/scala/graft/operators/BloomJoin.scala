package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Bloom-pruned shuffle join — the mid-size-dimension trick: when the
  * key side is too big to broadcast-hash-join but far smaller than the
  * fact, build a Bloom filter of its join keys (one combinable sketch
  * aggregation), broadcast THAT (a few MB regardless of key count),
  * and semi-filter the fact map-side BEFORE the shuffle. Shuffle
  * volume drops from |fact| to ~(match rate + fpp)·|fact|; Bloom has
  * no false negatives, so the subsequent equi-join returns exactly the
  * plain join's rows (false positives die in the join itself —
  * row-parity is spec-gated).
  *
  * Spark's runtime bloom filtering (`spark.sql.optimizer.runtime.
  * bloomFilter.enabled`) makes the same move when stats justify it;
  * this is the explicit, deterministic form for pipelines that KNOW
  * the shape (e.g. events ⋈ flagged-users at 100 TB) and can't leave
  * a 100× shuffle reduction to a cost model's discretion.
  *
  * The probe is a broadcast-variable UDF (off codegen but row-local
  * and branch-free); the sketch build pays one pass over the DISTINCT
  * keys. The returned plan is lazy and may execute many times, so the
  * broadcast cannot be destroyed here — [[prunedReleasable]] hands the
  * caller a release hook instead; session-long callers should build,
  * consume, and release per batch (the [[Dedup.decontaminateBloom]]
  * discipline; the round-8 advisory's accumulating-broadcast fix).
  */
object BloomJoin {

  /** `fact ⋈ keys` (inner, `factKey === dimKey`) with the fact
    * pre-filtered through a Bloom sketch of the key side. Long and
    * string keys supported (the two id shapes in this engine).
    * One-shot convenience over [[prunedReleasable]] — the sketch
    * broadcast lives until session end; repeated callers should use
    * the releasable form. */
  def pruned(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame =
    prunedReleasable(fact, factKey, dim, dimKey, fpp)._1

  /** [[pruned]] plus a release hook that destroys the broadcast
    * sketch's driver+executor blocks. Call it only after every
    * execution of the returned plan has finished — the plan is lazy
    * and re-executes the probe on each action. */
  def prunedReleasable(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): (DataFrame, () => Unit) = {
    val spark = fact.sparkSession
    val keyType = fact.schema(factKey).dataType
    if (keyType != LongType && keyType != StringType)
      throw new IllegalArgumentException(
        s"BloomJoin supports long/string keys, got $keyType for $factKey")
    // snapshot: the count and the sketch build would otherwise each
    // re-run the caller's dim plan
    val keys = Stage.snap(dim.select(dimKey).distinct(), materialize = true)
    val n = math.max(1L, keys.count())
    val bf = keys.stat.bloomFilter(dimKey, n, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val probe = keyType match {
      case LongType =>
        val f = udf((k: Long) => bfB.value.mightContainLong(k))
        f(col(factKey))
      case _ =>
        val f = udf((k: String) => k != null && bfB.value.mightContainString(k))
        f(col(factKey))
    }
    (fact.where(probe).join(dim, col(factKey) === col(dimKey)),
      () => bfB.destroy())
  }
}
