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

  /** [[pruned]] with the probe inside whole-stage codegen: both sides
    * hash their key through `xxhash64` (one codegen'd expression, any
    * key type), the sketch is built over the hashed longs, and the
    * fact probes through Spark's native `BloomFilterMightContain` —
    * the exact expression `InjectRuntimeFilter` plants, which carries
    * `doGenCode` and deserializes the sketch once per task instead of
    * boxing a UDF call per row.
    *
    * The serialized sketch rides in the plan as a binary literal
    * (~1.2 MB per million keys at fpp=1%) — the same post-subquery
    * shape Spark's own runtime filter executes, so there is no
    * broadcast to release; the sketch's lifetime is the plan's. For
    * dims big enough that a plan-embedded literal hurts (tens of MB),
    * use [[prunedReleasable]] and pay the boxed probe.
    *
    * xxhash64(null) folds to the seed hash, so a null fact key can
    * survive the probe as a false positive — and then dies in the
    * inner equi-join like every other false positive. Row parity with
    * the plain join is spec-gated (BloomJoinSpec). */
  def prunedCodegen(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    // snapshot: count + sketch build would each re-run the dim plan
    val keys = Stage.snap(
      dim.select(xxhash64(col(dimKey)).as("h")).distinct(),
      materialize = true)
    val n = math.max(1L, keys.count())
    val bf = keys.stat.bloomFilter("h", n, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    val probe = call_function("bloom_might_contain",
      lit(out.toByteArray), xxhash64(col(factKey)))
    fact.where(probe).join(dim, col(factKey) === col(dimKey))
  }
}
