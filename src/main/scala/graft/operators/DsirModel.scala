package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Persisted DSIR importance model — the fit-once / score-many form of
  * [[TextAnalysis.dsirWeights]]. A 100 TB selection run doesn't recompute
  * the target and raw bag models per batch: it fits them ONCE (typically
  * on samples), freezes the per-bucket log-ratios, and applies the
  * frozen model to every incoming batch at ingest. Refits publish NEW
  * versions behind one atomic [[StateCommit]] pointer swap; old versions
  * stay readable ([[scoreAt]]) so a long selection sweep stays pinned to
  * the model it started with instead of silently mixing scoring regimes
  * mid-run.
  *
  * == Layout (the [[AnnIndex]]/[[DedupIndex]] snapshot discipline) ==
  * {{{
  *   root/CURRENT        — StateCommit pointer: committed version
  *   root/snap-v/model/  — (bucket, micro): frozen log-ratios, ≤ buckets rows
  *   root/snap-v/meta/   — (buckets, nt, nr): scheme + the totals it froze
  * }}}
  *
  * The model table and the scoring math are [[TextAnalysis.dsirMicro]] /
  * [[TextAnalysis.dsirApply]] — the SAME code the in-query operator runs,
  * so `score(fit(raw, target), raw)` equals `dsirWeights(raw, target)`
  * row-for-row by construction (spec-gated, and the ta_dsir_store driver
  * gate shares ta_dsir's DuckDB oracle).
  *
  * Scale posture: fitting is two hashed-gram passes (map-side combinable
  * counts) ending in a ≤`buckets`-row table; the write is one
  * metadata-sized parquet. Scoring broadcasts the model and pays one
  * gram pass over the batch — the corpus never shuffles on the model's
  * account. */
object DsirModel {

  private val Model = "model"
  private val Meta = "meta"

  /** The committed model version; refits bump it by one. */
  def version(spark: SparkSession, root: String): Long =
    StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed DSIR model at $root (run DsirModel.fit first)"))

  /** Fit and commit a new model version from the two corpora; returns
    * the committed version. `retain` is the StateCommit snapshot-expiry
    * horizon: how many model versions stay readable for [[scoreAt]]
    * pinning (default 2 = current + predecessor; raise it when long
    * sweeps must outlive several refits). */
  def fit(raw: DataFrame, target: DataFrame, root: String,
      buckets: Int = 4096, retain: Int = 2): Long = {
    val spark = raw.sparkSession
    val v = StateCommit.currentVersion(spark, root).getOrElse(0L) + 1
    val micro = TextAnalysis.dsirMicro(
      TextAnalysis.hashedGrams(raw, buckets),
      TextAnalysis.hashedGrams(target, buckets), buckets)
    micro.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, Model))
    val s = spark; import s.implicits._
    Seq(Tuple1(buckets)).toDF("buckets").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Meta))
    StateCommit.commit(spark, root, v, retain)
    v
  }

  /** The frozen (bucket, micro) table of the committed version. */
  def model(spark: SparkSession, root: String): DataFrame =
    modelAt(spark, root, version(spark, root))

  private def modelAt(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(StateCommit.tableDir(root, v, Model))

  private def bucketsAt(spark: SparkSession, root: String, v: Long): Int =
    spark.read.parquet(StateCommit.tableDir(root, v, Meta))
      .head().getInt(0)

  /** Score `docs` against the committed model: (doc_id, n_grams,
    * micro_logw), the [[TextAnalysis.dsirWeights]] output contract. */
  def score(spark: SparkSession, root: String, docs: DataFrame): DataFrame =
    scoreAt(spark, root, docs, version(spark, root))

  /** [[score]] pinned to an explicit model version (time travel): a
    * refit mid-sweep must not change the scoring of batches attributed
    * to the old model. */
  def scoreAt(spark: SparkSession, root: String, docs: DataFrame,
      v: Long): DataFrame = {
    val buckets = bucketsAt(spark, root, v)
    TextAnalysis.dsirApply(docs,
      TextAnalysis.hashedGrams(docs, buckets), modelAt(spark, root, v))
  }
}
