package graft.operators

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Persisted inverted (lexical) index with BM25 ranking — the
  * build-once / query-many LEXICAL complement to the ANN family
  * ([[AnnIndex]]/[[AnnIndexPq]] answer "semantically near", this
  * answers "contains these terms", and [[LexIndex.hybrid]] fuses the
  * two; [[LexIndex.delete]] tombstones documents without a rebuild):
  * postings carry (token, doc_id, tf, dl) — document length is
  * denormalized INTO the posting row, the classic payload trick, so
  * scoring never joins a doc-length table at query time — plus
  * metadata-sized document-frequency and corpus-stat tables, published
  * atomically as one [[StateCommit]] snapshot.
  *
  * Query cost is the inverted-index contract: ONLY the query terms'
  * posting rows are read (`token IN (...)` pushes to the parquet
  * scan), never the corpus. Postings land hive-partitioned by the
  * token's first letter (`tpfx=<a..z>`) and repartitioned by token
  * within each partition, so a query PRUNES AT THE DIRECTORY level —
  * only its terms' prefix partitions are listed or opened (plan-gated:
  * `PartitionFilters: [tpfx IN (...)]`), the [[AnnIndex]] cell
  * discipline applied to text — and the row-level token IN still
  * pushes to each opened file.
  *
  * Scoring is Okapi BM25 with the engine's RSJ idf (the
  * [[TextAnalysis.bm25TopK]] math), with each per-term score rounded
  * to integer MICRO-points (×10⁶) BEFORE the per-doc sum — the
  * fixed-point aggregate contract that makes the total exact and
  * order-independent across engines (a raw double sum would be
  * partial-aggregation-order dependent).
  *
  * Tokenization is `[a-z]+` over lowercased text — byte-for-byte the
  * [[TextAnalysis]] tokenizer, so index statistics agree with every
  * corpus-level text operator.
  */
object LexIndex {

  private val Dfs = "dfs"
  private val Stats = "stats"
  private val Manifest = "manifest"
  private val Tombstones = "tombstones"
  private val StreamBatch = "stream_batch"
  private val DeleteAll = Long.MaxValue

  private def tokens(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("token"))

  private def genDir(root: String, v: Long): String = s"$root/gen-$v/postings"

  /** The batch's (postings, dfs, stats) derivation — shared by build
    * and ingest, so the incremental path cannot drift from the
    * full-build one. */
  private def batchParts(documents: DataFrame) = {
    val tf = Stage.snap(
      tokens(documents).groupBy("doc_id", "token").agg(count(lit(1)).as("tf")),
      materialize = true)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val postings = tf.join(dl, Seq("doc_id"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
    val dfs = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = documents.select(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(
        coalesce(sum("dl"), lit(0L)).as("sum_dl"),
        count(lit(1)).as("n_dl")))
    (postings, dfs, stats)
  }

  private def emptyTombstones(spark: SparkSession): DataFrame = {
    val s = spark; import s.implicits._
    Seq.empty[(Long, Long)].toDF("doc_id", "before_gen")
  }

  /** Snapshot v's tombstones: (doc_id, before_gen) — the doc's posting
    * rows in generations < before_gen are dead (the [[DedupIndex]]
    * table verbatim; a delete writes Long.MaxValue, a re-ingest of a
    * deleted id replaces it with the new generation). Bounded by churn
    * since the last [[compactGenerations]], never corpus-sized — it
    * broadcasts into every read. Absent table (pre-tombstone snapshot)
    * reads as empty. */
  private def tombstonesOf(spark: SparkSession, root: String,
      v: Long): DataFrame =
    scala.util.Try(
        spark.read.parquet(StateCommit.tableDir(root, v, Tombstones)))
      .getOrElse(emptyTombstones(spark))

  /** The maintaining stream's last applied batch id, recorded IN the
    * snapshot (so it commits atomically with the generation it guards).
    * None before any stream batch, and reset by [[build]] — a rebuild
    * starts a new stream era (resume a stream across a rebuild with a
    * FRESH checkpoint). */
  private def streamBatchOf(spark: SparkSession, root: String,
      v: Long): Option[Long] =
    scala.util.Try(
        spark.read.parquet(StateCommit.tableDir(root, v, StreamBatch))
          .head().getLong(0))
      .toOption

  /** The LIVE posting rows of snapshot v: every live generation's rows,
    * tombstone-filtered (broadcast join — the tombstone table is
    * churn-bounded). Shape (token, doc_id, tf, dl). `prefixes` applies
    * directory-level pruning: only the named `tpfx=` partitions of each
    * generation are listed/opened (a query passes its terms' first
    * letters; maintenance passes read everything). */
  private def livePostings(spark: SparkSession, root: String, v: Long,
      prefixes: Option[Seq[String]] = None): DataFrame = {
    val gens = spark.read.parquet(StateCommit.tableDir(root, v, Manifest))
      .collect().map(_.getLong(0)).toSeq
    val unioned = gens.map { g =>
      val full = spark.read.parquet(genDir(root, g))
      val pruned = prefixes match {
        case Some(ps) if full.columns.contains("tpfx") =>
          full.where(col("tpfx").isin(ps: _*))
        case _ => full
      }
      // canonical projection BEFORE the union: a manifest can mix
      // tpfx-partitioned generations with pre-tpfx ones (an index built
      // by older code, upgraded by one ingest), and unionByName over
      // heterogeneous schemas would throw on every read
      pruned.select(col("token"), col("doc_id"), col("tf"), col("dl"),
        lit(g).as("gen"))
    }.reduce(_.unionByName(_))
    unioned.join(broadcast(tombstonesOf(spark, root, v)),
        Seq("doc_id"), "left_outer")
      .where(col("before_gen").isNull || col("gen") >= col("before_gen"))
      .drop("before_gen", "gen")
  }

  /** Write the metadata-sized snapshot tables and commit — shared by
    * every mutation (postings generations are written by the caller,
    * when the mutation adds any). */
  private def writeMetaTables(spark: SparkSession, root: String, v: Long,
      dfs: DataFrame, stats: DataFrame, gens: Seq[Long],
      tombstones: DataFrame, streamBatch: Option[Long] = None): Long = {
    dfs.coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Dfs))
    stats.coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Stats))
    val s = spark
    import s.implicits._
    gens.toDF("gen").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Manifest))
    tombstones
      .select(col("doc_id").cast("long"), col("before_gen").cast("long"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, Tombstones))
    streamBatch.toSeq.toDF("last_batch_id").coalesce(1)
      .write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, StreamBatch))
    StateCommit.commit(spark, root, v)
    // reclaim generations no committed snapshot references — a
    // long-running ingest stream otherwise leaks one generation
    // directory per micro-batch forever
    StateCommit.gcGenerations(spark, root)
    v
  }



  private def writeSnapshot(spark: SparkSession, root: String, v: Long,
      postings: DataFrame, dfs: DataFrame, stats: DataFrame,
      gens: Seq[Long], nBuckets: Int, tombstones: DataFrame,
      streamBatch: Option[Long] = None): Long = {
    // hive-partition by the token's first letter (≤ 26 dirs — the
    // tokenizer is [a-z]+) so a search prunes whole directories;
    // repartition by token within so one term's rows co-locate
    postings.withColumn("tpfx", substring(col("token"), 1, 1))
      .repartition(nBuckets, col("token"))
      .write.mode("overwrite").partitionBy("tpfx")
      .parquet(genDir(root, v))
    writeMetaTables(spark, root, v, dfs, stats, gens, tombstones, streamBatch)
  }

  /** Build (or rebuild from scratch) the index; returns the committed
    * snapshot version. One corpus scan: tf, dl, df and the corpus
    * stats all derive from the same token aggregation. */
  def build(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32): Long = {
    val v = StateCommit.currentVersion(spark, root).getOrElse(0L) + 1
    val (postings, dfs, stats) = batchParts(documents)
    writeSnapshot(spark, root, v, postings, dfs, stats, Seq(v), nBuckets,
      emptyTombstones(spark))
  }

  /** Fold a batch of NEW documents into the index WITHOUT rescanning
    * the corpus: the batch's postings land as an immutable generation,
    * and the df / corpus-stat tables merge algebraically (df and
    * doc-count/token-total sums are EXACTLY additive over disjoint doc
    * sets), so a search over the ingested index is row-for-row equal
    * to one over a from-scratch rebuild — spec-pinned, and the
    * lx_search_inc driver gate proves it against the full-corpus
    * oracle. Contract: batches are append-only NEW doc_ids (the
    * [[IncrementalAgg]] discipline), with one exception: a previously
    * [[delete]]d id may re-ingest — its tombstone advances to this
    * generation, so the dead old rows stay dead and the new rows are
    * live (the delete already subtracted the old df/stats
    * contributions, so the algebra stays exact). Re-ingesting a LIVE
    * doc still double-counts. */
  def ingest(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32): Long =
    ingestAs(spark, documents, root, expectedVersion = -1L, nBuckets)

  /** [[ingest]] with an at-least-once replay guard: the write commits
    * as exactly `expectedVersion` and is a NO-OP (returning the
    * current version) when that version is already committed — the
    * [[graft.streaming.StreamingAgg]] discipline, for streams that
    * re-deliver a failed batch under the same id. `expectedVersion
    * = -1` means "next" (the batch-job form, no replay protection). */
  def ingestAs(spark: SparkSession, documents: DataFrame, root: String,
      expectedVersion: Long, nBuckets: Int = 32): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (expectedVersion >= 0 && expectedVersion <= prev) return prev // replay
    val v = if (expectedVersion >= 0) expectedVersion else prev + 1
    require(v == prev + 1, s"ingest version $v must follow committed $prev")
    ingestCore(spark, documents, root, prev, v, nBuckets,
      streamBatchOf(spark, root, prev))
  }

  /** Stream-maintenance ingest keyed by the STREAM'S OWN batch id, the
    * replay guard recorded inside the snapshot itself: batch B applies
    * iff B is greater than the last applied batch id (committed
    * atomically with the generation it guards), and the snapshot
    * version is simply `committed + 1`. Unlike version arithmetic over
    * a remembered base, this stays correct when OTHER writers mutate
    * the index between stream runs (a takedown [[delete]] or a
    * [[compactGenerations]] bumps the version; the watermark does not
    * move, so the next batch still applies instead of being mistaken
    * for a replay — round-10 review finding). [[build]] resets the
    * watermark: resuming a stream across a rebuild needs a fresh
    * checkpoint. */
  def ingestBatch(spark: SparkSession, documents: DataFrame, root: String,
      batchId: Long, nBuckets: Int = 32): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (streamBatchOf(spark, root, prev).exists(batchId <= _))
      return prev // replay of an applied batch — converged no-op
    ingestCore(spark, documents, root, prev, prev + 1, nBuckets,
      Some(batchId))
  }

  private def ingestCore(spark: SparkSession, documents: DataFrame,
      root: String, prev: Long, v: Long, nBuckets: Int,
      streamBatch: Option[Long]): Long = {
    val (postings, bDfs, bStats) = batchParts(documents)
    val oldDfs = spark.read.parquet(StateCommit.tableDir(root, prev, Dfs))
    val mergedDfs = oldDfs.select(col("token"), col("df").as("a"))
      .join(bDfs.select(col("token"), col("df").as("b")), Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("a"), lit(0L)) + coalesce(col("b"), lit(0L))).as("df"))
    val o = spark.read.parquet(StateCommit.tableDir(root, prev, Stats)).head()
    val b = bStats.head()
    val s = spark
    import s.implicits._
    val mergedStats = Seq((o.getLong(0) + b.getLong(0),
      o.getLong(1) + b.getLong(1), o.getLong(2) + b.getLong(2)))
      .toDF("n_docs", "sum_dl", "n_dl")
    val gens = spark.read.parquet(StateCommit.tableDir(root, prev, Manifest))
      .collect().map(_.getLong(0)).toSeq :+ v
    // tombstone rows for ids this batch RE-ingests advance to this
    // generation (resurrecting the doc with its new content); other
    // rows carry forward — the table stays churn-bounded because only
    // deleted-and-not-yet-reingested ids live in it
    val prior = tombstonesOf(spark, root, prev)
    val batchIds = documents.select(col("doc_id").cast("long")).distinct()
    val tombs = prior.join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(prior.join(batchIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), lit(v).as("before_gen")))
    writeSnapshot(spark, root, v, postings, mergedDfs, mergedStats, gens,
      nBuckets, tombs, streamBatch)
  }

  /** Drop documents from the index without a rebuild — the takedown /
    * revocation path: one tombstone row per id plus ALGEBRAIC df/stats
    * corrections, published atomically as the next snapshot. Metadata-
    * sized writes only — no posting generation is rewritten (the dead
    * rows stay on disk, masked at read time, until
    * [[compactGenerations]] folds them away and clears the
    * tombstones). df rows that reach zero drop out, and the corpus
    * stats subtract the victims' doc counts and token totals, so a
    * post-delete [[search]] is row-for-row equal to one over an index
    * rebuilt without the victims (spec-pinned; the lx_search_del
    * driver gate proves it against the filtered-corpus oracle).
    *
    * Ids without live postings are no-ops (so replays converge), with
    * the one blind spot a postings-only index has: a ZERO-TOKEN doc is
    * invisible to postings and its `n_docs` contribution cannot be
    * located — it stays counted until the next rebuild (documented,
    * spec-pinned). `expectedVersion` is the [[ingestAs]] replay guard
    * (-1 = next, no protection).
    *
    * Scale posture: one tombstone-filtered scan of the posting
    * generations (the victim semi-join prunes it to the dead rows),
    * one broadcast-sized df merge, metadata writes — the corpus is
    * never rewritten. */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
      expectedVersion: Long = -1L): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root"))
    if (expectedVersion >= 0 && expectedVersion <= prev) return prev // replay
    val v = if (expectedVersion >= 0) expectedVersion else prev + 1
    require(v == prev + 1, s"delete version $v must follow committed $prev")
    val victims = ids.select(col("doc_id").cast("long")).distinct()
    // the victims' LIVE posting rows: already-dead rows must not
    // subtract twice (which is also what makes a replayed or repeated
    // delete a no-op on the statistics)
    val dead = Stage.snap(
      livePostings(spark, root, prev)
        .join(broadcast(victims), Seq("doc_id"), "left_semi"),
      materialize = true)
    val oldDfs = spark.read.parquet(StateCommit.tableDir(root, prev, Dfs))
    // postings hold ONE row per (token, doc), so the per-token dead-row
    // count IS the df decrement; rows at zero leave the table, exactly
    // as a rebuild-without-victims would never emit them
    val deadDf = dead.groupBy("token").agg(count(lit(1)).as("ddf"))
    val mergedDfs = oldDfs
      .join(deadDf, Seq("token"), "left_outer")
      .select(col("token"),
        (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
      .where(col("df") > 0)
    val d = dead.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s")).head()
    val (nDead, dlDead) = (d.getLong(0), d.getLong(1))
    val o = spark.read.parquet(StateCommit.tableDir(root, prev, Stats)).head()
    val s = spark
    import s.implicits._
    val mergedStats = Seq((o.getLong(0) - nDead, o.getLong(1) - dlDead,
      o.getLong(2) - nDead)).toDF("n_docs", "sum_dl", "n_dl")
    val prior = tombstonesOf(spark, root, prev)
    val tombs = prior.join(victims, Seq("doc_id"), "left_anti")
      .unionByName(victims.select(col("doc_id"),
        lit(DeleteAll).as("before_gen")))
    val gens = spark.read.parquet(StateCommit.tableDir(root, prev, Manifest))
      .collect().map(_.getLong(0)).toSeq
    writeMetaTables(spark, root, v, mergedDfs, mergedStats, gens, tombs,
      streamBatchOf(spark, root, prev))
  }

  /** Fold every live generation's postings into ONE new generation —
    * the maintenance pass a long-running ingest stream needs (each
    * micro-batch adds a generation; a query unions them all, and
    * per-generation file overhead grows without bound). Pure layout:
    * the postings multiset, df table and corpus stats are unchanged,
    * so a search is byte-identical before and after (spec-pinned) —
    * the [[Compact]] content-neutrality contract at the index level.
    * Publication is the usual atomic snapshot; old generations stay on
    * disk for in-flight readers of the previous version. */
  def compactGenerations(spark: SparkSession, root: String,
      nBuckets: Int = 32): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root"))
    val v = prev + 1
    // the LIVE multiset only: tombstoned rows die physically here, and
    // the tombstone table resets to empty — df/stats carry unchanged
    // (deletes corrected them algebraically at delete time)
    val postings = livePostings(spark, root, prev)
    val dfs = spark.read.parquet(StateCommit.tableDir(root, prev, Dfs))
    val stats = spark.read.parquet(StateCommit.tableDir(root, prev, Stats))
    writeSnapshot(spark, root, v, postings, dfs, stats, Seq(v), nBuckets,
      emptyTombstones(spark), streamBatchOf(spark, root, prev))
  }

  /** BM25 top-k for a bag of query terms: (doc_id, score_micro, rank).
    * Score is the exact BIGINT sum of per-term micro-scores; rank
    * breaks ties by doc_id. Terms not in the index contribute nothing;
    * an empty term list returns no rows. */
  def search(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchAt(spark, root, terms,
      StateCommit.currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed lexical index at $root")),
      k, k1, b)

  /** Time travel: [[search]] as of snapshot `v` — the reproducibility
    * surface ([[graft.streaming.StateCommit.readTableAt]]'s stance at
    * the index level): a retrieval run re-executed against yesterday's
    * committed snapshot answers exactly what it answered yesterday,
    * because generations are immutable and every snapshot pins its own
    * manifest/df/stats/tombstones. `v` must be within the retention
    * horizon (fails loudly otherwise — a silent fallback to another
    * version would corrupt any downstream reproduction). */
  def searchAt(spark: SparkSession, root: String, terms: Seq[String],
      v: Long, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val have = StateCommit.versions(spark, root)
    require(have.contains(v),
      s"snapshot $v not available at $root (retained: ${have.mkString(", ")})")
    if (terms.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("score_micro"),
          lit(0).as("rank")).limit(0)
    val stats = spark.read.parquet(StateCommit.tableDir(root, v, Stats))
    val dfs = spark.read.parquet(StateCommit.tableDir(root, v, Dfs))
      .where(col("token").isin(terms: _*))
    // live rows only (tombstone-filtered; the manifest's generation
    // list is metadata-sized — one entry per ingest since the last
    // rebuild). Directory-level pruning first (only the terms' tpfx
    // partitions are opened), then the token IN pushes through the
    // tombstone join to each opened file (both plan-gated).
    val postings = livePostings(spark, root, v,
        prefixes = Some(terms.map(_.take(1)).distinct))
      .where(col("token").isin(terms: _*))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_dl")
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    postings
      .join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id").cast("long").as("doc_id"),
        round(score * 1e6, 0).cast("bigint").as("micro"))
      .groupBy("doc_id").agg(sum("micro").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("int"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of this index's BM25
    * ranking with a brute-force cosine ranking of `queryVec` over
    * `embeddings` (vec_id ≡ doc_id in this corpus). RRF score per doc
    * = Σ over the lists it appears in of ⌊10⁶ / (60 + rank)⌋ —
    * integer division, so fusion is exact on both engines. The classic
    * robust fusion: no score normalization across incomparable scales,
    * just ranks. */
  def hybrid(spark: SparkSession, root: String, terms: Seq[String],
      embeddings: DataFrame, queryVecId: Long, k: Int = 10,
      poolK: Int = 50): DataFrame = {
    val lex = search(spark, root, terms, poolK)
      .select(col("doc_id"), col("rank").as("rank_lex"))
    val q = embeddings.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    val vec = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= queryVecId)
      .select(col("vec_id").cast("long").as("doc_id"),
        round(Similarity.cos(embeddings)(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(poolK)
      .withColumn("rank_vec", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cos").desc, col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("rank_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        (coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_vec)"), lit(0L))).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(k)
  }
}
