package graft.operators

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  private val EraTable = "era"
  private val DeleteAll = Long.MaxValue

  private def tokens(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("token"))

  private def genDir(root: String, v: Long): String = s"$root/gen-$v/postings"

  /** The generation's (doc_id, dl) doc table — ONE row per ingested doc
    * INCLUDING dl=0: a zero-token document is invisible to postings, and
    * round 10's delete could not locate its `n_docs` contribution (the
    * documented blind spot this table closes — delete/upsert subtract
    * every victim exactly). Lives beside the postings so [[StateCommit
    * .gcGenerations]] reclaims both together. */
  private def docsDir(root: String, v: Long): String = s"$root/gen-$v/docs"

  /** The batch's (postings, docs, dfs, stats, nPostings) derivation —
    * shared by build, ingest and upsert, so the incremental paths
    * cannot drift from the full-build one. nPostings (exact: postings
    * are 1:1 with tf rows, and tf is already checkpointed so the count
    * is a cached-block scan) feeds [[writeSnapshot]]'s bucket sizing. */
  private def batchParts(documents: DataFrame) = {
    val tf = Stage.snap(
      tokens(documents).groupBy("doc_id", "token").agg(count(lit(1)).as("tf")),
      materialize = true)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val postings = tf.join(dl, Seq("doc_id"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
    val dfs = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val docs = documents.select(col("doc_id").cast("long").as("doc_id"))
      .distinct()
      .join(dl.select(col("doc_id").cast("long").as("doc_id"), col("dl")),
        Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"))
    val stats = documents.select(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(
        coalesce(sum("dl"), lit(0L)).as("sum_dl"),
        count(lit(1)).as("n_dl")))
    (postings, docs, dfs, stats, tf.count())
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
        metaTable(spark, root, v, Tombstones))
      .getOrElse(emptyTombstones(spark))

  /** The maintaining stream's last applied batch id, recorded IN the
    * snapshot (so it commits atomically with the generation it guards).
    * None before any stream batch, and reset by [[build]] — a rebuild
    * starts a new stream era (resume a stream across a rebuild with a
    * FRESH checkpoint; [[buildEra]] + the [[graft.streaming
    * .StreamingLex]] checkpoint marker ENFORCE that rule instead of
    * leaving it to operator discipline — round-10 advice). */
  private def streamBatchOf(spark: SparkSession, root: String,
      v: Long): Option[Long] =
    scala.util.Try(
        metaTable(spark, root, v, StreamBatch)
          .head().getLong(0))
      .toOption

  private def eraOf(spark: SparkSession, root: String, v: Long): Long =
    scala.util.Try(
        metaTable(spark, root, v, EraTable)
          .head().getLong(0))
      .getOrElse(0L)

  /** The index's BUILD ERA: the snapshot version of the last [[build]]
    * (0 for a pre-era snapshot). Every ingest/delete/compact carries it
    * forward unchanged; a rebuild bumps it. A maintenance stream records
    * the era it started against and refuses to apply batches once the
    * index has been rebuilt under it — resuming an OLD checkpoint after
    * a rebuild could otherwise re-apply a crashed in-flight batch whose
    * docs the rebuild corpus already contains. */
  def buildEra(spark: SparkSession, root: String): Long = {
    val v = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root"))
    eraOf(spark, root, v)
  }

  /** The LIVE posting rows of snapshot v: every live generation's rows,
    * tombstone-filtered (broadcast join — the tombstone table is
    * churn-bounded). Shape (token, doc_id, tf, dl). `prefixes` applies
    * directory-level pruning: only the named `tpfx=` partitions of each
    * generation are listed/opened (a query passes its terms' first
    * letters; maintenance passes read everything). */
  private def livePostings(spark: SparkSession, root: String, v: Long,
      prefixes: Option[Seq[String]] = None): DataFrame = {
    val gens = metaTable(spark, root, v, Manifest)
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

  /** The LIVE (doc_id, dl) rows of snapshot v — one row per live doc
    * INCLUDING zero-token docs (the doc table, not the postings, is the
    * membership authority). Tombstone-filtered exactly like
    * [[livePostings]]. A generation written before the doc table
    * existed falls back to the postings-derived (doc_id, dl) set —
    * where zero-token docs are invisible, the pre-docs-table behavior. */
  private def liveDocs(spark: SparkSession, root: String,
      v: Long): DataFrame = {
    val gens = metaTable(spark, root, v, Manifest)
      .collect().map(_.getLong(0)).toSeq
    val unioned = gens.map { g =>
      scala.util.Try(spark.read.parquet(docsDir(root, g)))
        .getOrElse(spark.read.parquet(genDir(root, g))
          .select("doc_id", "dl").distinct())
        .select(col("doc_id").cast("long").as("doc_id"),
          col("dl").cast("long").as("dl"), lit(g).as("gen"))
    }.reduce(_.unionByName(_))
    unioned.join(broadcast(tombstonesOf(spark, root, v)),
        Seq("doc_id"), "left_outer")
      .where(col("before_gen").isNull || col("gen") >= col("before_gen"))
      .drop("before_gen", "gen")
  }

  /** The folded snapshot-metadata columns: every metadata-sized table
    * (dfs/stats/manifest/tombstones/stream_batch/era) lands in ONE
    * parquet write under `meta/`, discriminated by `t` — six
    * coalesce(1) committer rounds per commit (~0.2–0.3 s each at any
    * corpus size; the round-11 verdict measured them as lx_search_inc's
    * whole flat cost) become one. Columns are the union schema; a
    * table's reader selects its own and the rest stay NULL. */
  private val MetaCols: Seq[(String, String)] = Seq(
    "token" -> "string", "df" -> "long",
    "n_docs" -> "long", "sum_dl" -> "long", "n_dl" -> "long",
    "gen" -> "long",
    "doc_id" -> "long", "before_gen" -> "long",
    "last_batch_id" -> "long", "build_era" -> "long")

  private def toMetaRows(t: String, df: DataFrame): DataFrame =
    StateCommit.foldMetaRows(t, df, MetaCols)

  /** This family's logical-table column lists (select order is the
    * reader contract). */
  private[graft] def metaCols(table: String): Seq[String] = table match {
    case Dfs => Seq("token", "df")
    case Stats => Seq("n_docs", "sum_dl", "n_dl")
    case Manifest => Seq("gen")
    case Tombstones => Seq("doc_id", "before_gen")
    case StreamBatch => Seq("last_batch_id")
    case EraTable => Seq("build_era")
  }

  /** Read one logical meta table of snapshot `v` — the shared
    * folded-first/per-table-fallback probe ([[StateCommit.metaTable]],
    * one edit site for the layout precedence rule across the five
    * persisted families). */
  private[graft] def metaTable(spark: SparkSession, root: String,
      v: Long, table: String): DataFrame =
    StateCommit.metaTable(spark, root, v, table, metaCols(table))

  /** Generation GC runs on every commit that DROPPED generations from
    * the manifest (compaction, rebuild — the only commits that orphan
    * gen dirs directly) and otherwise only every `gcSweepEvery`-th
    * version (conf `spark.graft.lex.gcSweepEvery`) as a sweeper for the
    * retention-lag case: the snapshot preceding a compaction keeps the
    * superseded generations referenced until IT falls out of retention,
    * one append-only commit later, where no manifest shrinks. Append
    * commits (ingest/upsert/delete keep every prior gen) reclaim
    * nothing, and paying the GC pass's manifest reads + root listing on
    * each micro-batch was the dominant constant left in lx_search_inc
    * (round-12 #8); the sweep bounds the transient leak at
    * `gcSweepEvery` commits' worth of superseded dirs, only ever
    * following a compaction/rebuild. */

  /** Write the metadata-sized snapshot tables and commit — shared by
    * every mutation (postings generations are written by the caller,
    * when the mutation adds any). `droppedGens` = this commit removed
    * generations from the manifest (see the GC policy above). */
  private def writeMetaTables(spark: SparkSession, root: String, v: Long,
      dfs: DataFrame, stats: DataFrame, gens: Seq[Long],
      tombstones: DataFrame, streamBatch: Option[Long] = None,
      era: Long = 0L, droppedGens: Boolean = false): Long = {
    val s = spark
    import s.implicits._
    val meta = Seq(
      toMetaRows(Dfs, dfs),
      toMetaRows(Stats, stats),
      toMetaRows(Manifest, gens.toDF("gen")),
      toMetaRows(Tombstones, tombstones
        .select(col("doc_id").cast("long"), col("before_gen").cast("long"))),
      toMetaRows(StreamBatch, streamBatch.toSeq.toDF("last_batch_id")),
      toMetaRows(EraTable, Seq(era).toDF("build_era"))
    ).reduce(_.unionByName(_))
    meta.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, "meta"))
    StateCommit.commit(spark, root, v)
    val sweepEvery = graft.GraftConf.long(spark, graft.GraftConf.LexGcSweepEvery)
    if (droppedGens || (sweepEvery > 0 && v % sweepEvery == 0))
      StateCommit.gcGenerations(spark, root)
    v
  }



  /** Target posting rows per range bucket (~20 MB of narrow posting
    * rows): a 2-doc upsert generation must not fan out into nBuckets
    * range partitions — per-generation small files are the cost the
    * round-10 medians flagged, and incremental generations are usually
    * batch-sized. `rowHint` (exact from [[batchParts]], sum_dl upper
    * bound from the committed stats for compaction) scales the bucket
    * count DOWN; the caller's nBuckets stays the ceiling, which is the
    * knob a 100 TB corpus build raises. */
  private val TargetPostingsPerBucket = 512L * 1024

  private def writeSnapshot(spark: SparkSession, root: String, v: Long,
      postings: DataFrame, docs: DataFrame, dfs: DataFrame,
      stats: DataFrame, gens: Seq[Long], nBuckets: Int,
      tombstones: DataFrame, streamBatch: Option[Long] = None,
      era: Long = 0L, rowHint: Long = -1L,
      droppedGens: Boolean = false): Long = {
    val buckets =
      if (rowHint < 0) nBuckets
      else math.max(1L, math.min(nBuckets.toLong,
        (rowHint + TargetPostingsPerBucket - 1) / TargetPostingsPerBucket)).toInt
    // hive-partition by the token's first letter (≤ 26 dirs — the
    // tokenizer is [a-z]+) so a search prunes whole directories.
    // RANGE-partition by token before the write: each task then covers
    // a CONTIGUOUS token range, so it intersects only a few tpfx
    // prefixes and the generation lands as ~nBuckets+26 files instead
    // of the hash layout's nBuckets × 26 (the round-10 medians showed
    // that write amplification as lx_search_inc's real 1.8× regression).
    // Range by token ALONE: with doc_id in the range key a boundary can
    // land inside one hot token's doc_id run, splitting that term across
    // two files (round-11 review); the within-partition sort restores
    // (token, doc_id) row order for the file layout.
    postings.withColumn("tpfx", substring(col("token"), 1, 1))
      .repartitionByRange(buckets, col("token"))
      .sortWithinPartitions(col("token"), col("doc_id"))
      .write.mode("overwrite").partitionBy("tpfx")
      .parquet(genDir(root, v))
    // the generation's doc table: one narrow (doc_id, dl) row per doc —
    // a fraction of the postings' size, so a handful of files suffices
    docs.coalesce(math.max(1, buckets / 8))
      .write.mode("overwrite").parquet(docsDir(root, v))
    writeMetaTables(spark, root, v, dfs, stats, gens, tombstones,
      streamBatch, era, droppedGens)
  }

  /** Build (or rebuild from scratch) the index; returns the committed
    * snapshot version. One corpus scan: tf, dl, df and the corpus
    * stats all derive from the same token aggregation. A build starts a
    * new [[buildEra]]. */
  def build(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32): Long = {
    val prior = StateCommit.currentVersion(spark, root)
    val v = prior.getOrElse(0L) + 1
    val (postings, docs, dfs, stats, nPost) = batchParts(documents)
    // a REBUILD over an existing root drops every prior generation from
    // the manifest — GC immediately; a fresh build has nothing to drop
    writeSnapshot(spark, root, v, postings, docs, dfs, stats, Seq(v),
      nBuckets, emptyTombstones(spark), era = v, rowHint = nPost,
      droppedGens = prior.nonEmpty)
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
    * doc through THIS path still double-counts — updating live
    * documents is [[upsert]]'s job (one atomic snapshot, exact
    * algebra for every membership state). */
  def ingest(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32, seqCol: String = ""): Long =
    ingestAs(spark, documents, root, expectedVersion = -1L, nBuckets,
      seqCol)

  /** [[ingest]] with an at-least-once replay guard: the write commits
    * as exactly `expectedVersion` and is a NO-OP (returning the
    * current version) when that version is already committed — the
    * [[graft.streaming.StreamingAgg]] discipline, for streams that
    * re-deliver a failed batch under the same id. `expectedVersion
    * = -1` means "next" (the batch-job form, no replay protection). */
  def ingestAs(spark: SparkSession, documents: DataFrame, root: String,
      expectedVersion: Long, nBuckets: Int = 32,
      seqCol: String = ""): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (expectedVersion >= 0 && expectedVersion <= prev) return prev // replay
    val v = if (expectedVersion >= 0) expectedVersion else prev + 1
    require(v == prev + 1, s"ingest version $v must follow committed $prev")
    ingestCore(spark, documents, root, prev, v, nBuckets,
      streamBatchOf(spark, root, prev), seqCol)
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
      batchId: Long, nBuckets: Int = 32, seqCol: String = ""): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (streamBatchOf(spark, root, prev).exists(batchId <= _))
      return prev // replay of an applied batch — converged no-op
    ingestCore(spark, documents, root, prev, prev + 1, nBuckets,
      Some(batchId), seqCol)
  }

  private def ingestCore(spark: SparkSession, rawDocuments: DataFrame,
      root: String, prev: Long, v: Long, nBuckets: Int,
      streamBatch: Option[Long], seqCol: String = ""): Long = {
    // last-wins collapse, the upsert path's discipline (round-11
    // review): an at-least-once source can re-deliver a NEW doc twice
    // inside one trigger window, and batchParts over both copies would
    // double every token count, n_docs and sum_dl — silent, permanent
    // index corruption no later compaction corrects. Snapped: the
    // token pass and the tombstone id scan both read it
    val documents = Stage.snap(
      CdcBatch.collapse(rawDocuments, "doc_id", seqCol),
      materialize = true)
    val (postings, bDocs, bDfs, bStats, nPost) = batchParts(documents)
    val oldDfs = metaTable(spark, root, prev, Dfs)
    val mergedDfs = oldDfs.select(col("token"), col("df").as("a"))
      .join(bDfs.select(col("token"), col("df").as("b")), Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("a"), lit(0L)) + coalesce(col("b"), lit(0L))).as("df"))
    // batch and committed stats in ONE driver action (round-13 review)
    val sr = bStats.select(col("n_docs").as("bn"),
        col("sum_dl").as("bs"), col("n_dl").as("bndl"))
      .crossJoin(metaTable(spark, root, prev, Stats)
        .select(col("n_docs").as("on"), col("sum_dl").as("os"),
          col("n_dl").as("ondl")))
      .head()
    def g(n: String): Long = sr.getAs[Long](n)
    val s = spark
    import s.implicits._
    val mergedStats = Seq((g("on") + g("bn"),
      g("os") + g("bs"), g("ondl") + g("bndl")))
      .toDF("n_docs", "sum_dl", "n_dl")
    val gens = metaTable(spark, root, prev, Manifest)
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
    writeSnapshot(spark, root, v, postings, bDocs, mergedDfs, mergedStats,
      gens, nBuckets, tombs, streamBatch, eraOf(spark, root, prev), nPost)
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
    * Ids without live rows are no-ops (so replays converge) and add NO
    * tombstone — only live victims are tombstoned (semi-join against
    * the live doc set), so repeated takedown sweeps with overlapping or
    * bogus id lists cannot grow the churn-bounded tombstone table
    * (round-10 advice). Zero-token docs subtract exactly too: the
    * per-generation DOC table (not the postings) is the membership
    * authority, closing round 10's documented `n_docs` blind spot.
    * `expectedVersion` is the [[ingestAs]] replay guard (-1 = next, no
    * protection).
    *
    * Scale posture: one tombstone-filtered scan of the posting
    * generations (the victim semi-join prunes it to the dead rows) plus
    * one of the narrow doc tables, one broadcast-sized df merge,
    * metadata writes — the corpus is never rewritten. */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
      expectedVersion: Long = -1L): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root"))
    if (expectedVersion >= 0 && expectedVersion <= prev) return prev // replay
    val v = if (expectedVersion >= 0) expectedVersion else prev + 1
    require(v == prev + 1, s"delete version $v must follow committed $prev")
    val victims = ids.select(col("doc_id").cast("long")).distinct()
    // the victims' LIVE rows only: already-dead rows must not subtract
    // twice (which is also what makes a replayed or repeated delete a
    // no-op on the statistics). deadPost has ONE consumer (the df
    // decrement) — no snap (round-13 review)
    val deadPost = livePostings(spark, root, prev)
      .join(broadcast(victims), Seq("doc_id"), "left_semi")
    val deadDocs = Stage.snap(
      liveDocs(spark, root, prev)
        .join(broadcast(victims), Seq("doc_id"), "left_semi"),
      materialize = true)
    val oldDfs = metaTable(spark, root, prev, Dfs)
    // postings hold ONE row per (token, doc), so the per-token dead-row
    // count IS the df decrement; rows at zero leave the table, exactly
    // as a rebuild-without-victims would never emit them
    val deadDf = deadPost.groupBy("token").agg(count(lit(1)).as("ddf"))
    val mergedDfs = oldDfs
      .join(deadDf, Seq("token"), "left_outer")
      .select(col("token"),
        (col("df") - coalesce(col("ddf"), lit(0L))).as("df"))
      .where(col("df") > 0)
    // exact stat subtraction from the doc table: n_docs loses EVERY live
    // victim (zero-token ones included), n_dl only those with tokens —
    // fused with the committed-stats read into ONE driver action
    val sr = deadDocs.agg(count(lit(1)).as("dn"),
        coalesce(sum("dl"), lit(0L)).as("ds"),
        count(when(col("dl") > 0, 1)).as("dndl"))
      .crossJoin(metaTable(spark, root, prev, Stats)
        .select(col("n_docs").as("on"), col("sum_dl").as("os"),
          col("n_dl").as("ondl")))
      .head()
    def g(n: String): Long = sr.getAs[Long](n)
    val s = spark
    import s.implicits._
    val mergedStats = Seq((g("on") - g("dn"), g("os") - g("ds"),
      g("ondl") - g("dndl"))).toDF("n_docs", "sum_dl", "n_dl")
    val prior = tombstonesOf(spark, root, prev)
    // tombstone only ids that actually had live rows; anti-join against
    // the SAME set so an already-dead victim keeps its existing
    // tombstone (dropping it would resurrect its pre-delete rows)
    val victimsLive = deadDocs.select("doc_id").distinct()
    val tombs = prior.join(victimsLive, Seq("doc_id"), "left_anti")
      .unionByName(victimsLive.select(col("doc_id"),
        lit(DeleteAll).as("before_gen")))
    val gens = metaTable(spark, root, prev, Manifest)
      .collect().map(_.getLong(0)).toSeq
    writeMetaTables(spark, root, v, mergedDfs, mergedStats, gens, tombs,
      streamBatchOf(spark, root, prev), eraOf(spark, root, prev))
  }

  /** Atomic live-document UPDATE — tombstone-advance + ingest in ONE
    * snapshot: each batch doc's pre-existing rows (if any) die and its
    * new content lands as generation v, with df/corpus stats corrected
    * by exact subtract-old/add-new algebra. This is the routine
    * curation event [[ingest]] documents as its own hazard
    * ("re-ingesting a LIVE doc still double-counts"): callers no longer
    * sequence delete→ingest across two snapshots — and cannot
    * double-count by forgetting the delete. Handles every membership
    * state uniformly: live ids update, deleted ids resurrect, new ids
    * simply ingest. A post-upsert [[search]] is row-for-row equal to a
    * from-scratch rebuild with the updated corpus (spec-pinned; the
    * lx_search_upd driver gate proves it against the updated-corpus
    * oracle).
    *
    * Scale posture: [[delete]]'s pruned dead-row scan + [[ingest]]'s
    * batch-only token pass; the corpus is never rescanned or
    * rewritten. */
  def upsert(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32, expectedVersion: Long = -1L,
      seqCol: String = ""): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (expectedVersion >= 0 && expectedVersion <= prev) return prev // replay
    val v = if (expectedVersion >= 0) expectedVersion else prev + 1
    require(v == prev + 1, s"upsert version $v must follow committed $prev")
    upsertCore(spark, documents, root, prev, v, nBuckets,
      streamBatchOf(spark, root, prev), seqCol)
  }

  /** Stream-maintenance UPSERT keyed by the stream's own batch id — the
    * [[ingestBatch]] watermark discipline applied to the live-document
    * UPDATE path: a CDC feed of changed documents maintains the index
    * through at-least-once delivery, with re-delivered batches refused
    * by the in-snapshot watermark (committed atomically with the
    * generation it guards). */
  def upsertBatch(spark: SparkSession, documents: DataFrame, root: String,
      batchId: Long, nBuckets: Int = 32, seqCol: String = ""): Long = {
    val prev = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root — build first"))
    if (streamBatchOf(spark, root, prev).exists(batchId <= _))
      return prev // replay of an applied batch — converged no-op
    upsertCore(spark, documents, root, prev, prev + 1, nBuckets,
      Some(batchId), seqCol)
  }

  private def upsertCore(spark: SparkSession, rawDocuments: DataFrame,
      root: String, prev: Long, v: Long, nBuckets: Int,
      streamBatch: Option[Long], seqCol: String = ""): Long = {
    // last-wins collapse: a CDC batch may carry several versions of one
    // doc — the delete+ingest algebra below assumes one row per id.
    // Snapped: batchIds, the token pass and the docs table all read it
    val documents = Stage.snap(
      CdcBatch.collapse(rawDocuments, "doc_id", seqCol),
      materialize = true)
    val batchIds = Stage.snap(
      documents.select(col("doc_id").cast("long").as("doc_id")).distinct(),
      materialize = true)
    // the batch ids' CURRENT live contribution — empty for brand-new or
    // previously-deleted ids, so the subtraction is exactly the delete()
    // algebra restricted to docs that really are being replaced.
    // deadPost has ONE consumer (the df decrement below) — no snap: a
    // materialization pass over the pruned postings scan bought nothing
    // (round-13 review)
    val deadPost = livePostings(spark, root, prev)
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
    val deadDocs = Stage.snap(
      liveDocs(spark, root, prev)
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi"),
      materialize = true)
    val (postings, bDocs, bDfs, bStats, nPost) = batchParts(documents)
    val deadDf = deadPost.groupBy("token").agg(count(lit(1)).as("ddf"))
    val oldDfs = metaTable(spark, root, prev, Dfs)
    val mergedDfs = oldDfs.select(col("token"), col("df").as("a"))
      .join(bDfs.select(col("token"), col("df").as("b")), Seq("token"), "full_outer")
      .join(deadDf, Seq("token"), "left_outer")
      .select(col("token"),
        (coalesce(col("a"), lit(0L)) + coalesce(col("b"), lit(0L))
          - coalesce(col("ddf"), lit(0L))).as("df"))
      .where(col("df") > 0)
    // ONE driver action for the three 1-row stat sources (dead, batch,
    // committed) — three separate head() calls were three jobs of pure
    // scheduling constant on the incremental path (round-13 review)
    val sr = deadDocs.agg(count(lit(1)).as("dn"),
        coalesce(sum("dl"), lit(0L)).as("ds"),
        count(when(col("dl") > 0, 1)).as("dndl"))
      .crossJoin(bStats.select(col("n_docs").as("bn"),
        col("sum_dl").as("bs"), col("n_dl").as("bndl")))
      .crossJoin(metaTable(spark, root, prev, Stats)
        .select(col("n_docs").as("on"), col("sum_dl").as("os"),
          col("n_dl").as("ondl")))
      .head()
    def g(n: String): Long = sr.getAs[Long](n)
    val s = spark
    import s.implicits._
    val mergedStats = Seq((
      g("on") + g("bn") - g("dn"),
      g("os") + g("bs") - g("ds"),
      g("ondl") + g("bndl") - g("dndl")))
      .toDF("n_docs", "sum_dl", "n_dl")
    // tombstones advance to v for every batch id that needs one: ids
    // with live rows being replaced, and previously-deleted ids whose
    // tombstone must move (not vanish — dropping it would resurrect
    // their dead rows; before_gen=v keeps gens < v dead and only the
    // new generation live). Brand-new ids add no tombstone.
    val prior = tombstonesOf(spark, root, prev)
    val needTomb = deadDocs.select("doc_id")
      .unionByName(prior.join(batchIds, Seq("doc_id"), "left_semi")
        .select("doc_id"))
      .distinct()
    val tombs = prior.join(batchIds, Seq("doc_id"), "left_anti")
      .unionByName(needTomb.select(col("doc_id"), lit(v).as("before_gen")))
    val gens = metaTable(spark, root, prev, Manifest)
      .collect().map(_.getLong(0)).toSeq :+ v
    writeSnapshot(spark, root, v, postings, bDocs, mergedDfs, mergedStats,
      gens, nBuckets, tombs, streamBatch, eraOf(spark, root, prev), nPost)
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
    val docs = liveDocs(spark, root, prev)
    val dfs = metaTable(spark, root, prev, Dfs)
    val stats = metaTable(spark, root, prev, Stats)
    // bucket hint: the committed sum_dl upper-bounds live posting rows
    // (tf >= 1 per row), read from the 1-row stats table — no data pass
    val hint = stats.head().getLong(1)
    writeSnapshot(spark, root, v, postings, docs, dfs, stats, Seq(v),
      nBuckets, emptyTombstones(spark), streamBatchOf(spark, root, prev),
      eraOf(spark, root, prev), rowHint = hint, droppedGens = true)
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
    StateCommit.requireRetained(spark, root, v)
    if (terms.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("score_micro"),
          lit(0).as("rank")).limit(0)
    val stats = metaTable(spark, root, v, Stats)
    val dfs = metaTable(spark, root, v, Dfs)
      .where(col("token").isin(terms: _*))
    // live rows only (tombstone-filtered; the manifest's generation
    // list is metadata-sized — one entry per ingest since the last
    // rebuild). Directory-level pruning first (only the terms' tpfx
    // partitions are opened), then the token IN pushes through the
    // tombstone join to each opened file (both plan-gated).
    val postings = livePostings(spark, root, v,
        prefixes = Some(terms.map(_.take(1)).distinct))
      .where(col("token").isin(terms: _*))
    postings
      .join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id").cast("long").as("doc_id"),
        bm25Micro(k1, b).as("micro"))
      .groupBy("doc_id").agg(sum("micro").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("int"))
  }

  /** The exact BM25 per-posting micro-score over the joined
    * (postings ⋈ dfs ⋈ stats) row shape — ONE edit site for the
    * oracle-parity-critical constants, shared by [[searchAt]] and
    * [[searchManyAt]]. */
  private def bm25Micro(k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / col("n_dl")
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    round(score * 1e6, 0).cast("bigint")
  }

  /** Batched BM25 — per-qid top-k for a driver-side (qid → terms) list
    * in ONE job: (qid, doc_id, score_micro, rank). Per-qid semantics
    * are exactly [[search]]'s (spec-pinned): the postings scan is
    * pruned and filtered by the UNION of all queries' terms (tpfx
    * directory pruning + token pushdown, both plan-gated), each
    * posting row fans out to the qids that asked for its token via a
    * broadcast (qid, token) map, and the per-qid ranking is one rank
    * window over (qid). N queries cost one index scan plus one shuffle
    * keyed (qid, doc_id) — not N driver round-trips. `termsByQid` is
    * driver-side by design (query terms originate at the caller), so
    * the prefix pruning list needs no action. */
  def searchMany(spark: SparkSession, root: String,
      termsByQid: Seq[(Long, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchManyAt(spark, root, termsByQid,
      StateCommit.currentVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed lexical index at $root")),
      k, k1, b)

  /** Time travel: [[searchMany]] as of snapshot `v`. */
  def searchManyAt(spark: SparkSession, root: String,
      termsByQid: Seq[(Long, Seq[String])], v: Long, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    StateCommit.requireRetained(spark, root, v)
    val s = spark; import s.implicits._
    val qt = termsByQid
      .flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }.distinct
    if (qt.isEmpty)
      return Seq.empty[(Long, Long, Long, Int)]
        .toDF("qid", "doc_id", "score_micro", "rank")
    val allTerms = qt.map(_._2).distinct
    val stats = metaTable(spark, root, v, Stats)
    val dfs = metaTable(spark, root, v, Dfs)
      .where(col("token").isin(allTerms: _*))
    val postings = livePostings(spark, root, v,
        prefixes = Some(allTerms.map(_.take(1)).distinct))
      .where(col("token").isin(allTerms: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score_micro").desc, col("doc_id"))
    postings
      .join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qt.toDF("qid", "token")), Seq("token"))
      .select(col("qid"), col("doc_id").cast("long").as("doc_id"),
        bm25Micro(k1, b).as("micro"))
      .groupBy("qid", "doc_id").agg(sum("micro").as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
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
    rrfFuse(lex, vec, k)
  }

  /** The exact integer RRF score over a joined (rank_lex, rank_vec)
    * row — `1000000 div (60 + rank)` is the oracle-parity-critical
    * constant, so it gets ONE edit site, shared by the single-pool and
    * per-qid fusers. */
  private def rrfMicro: Column =
    coalesce(expr("1000000 div (60 + rank_lex)"), lit(0L)) +
      coalesce(expr("1000000 div (60 + rank_vec)"), lit(0L))

  /** Exact integer RRF fusion of a (doc_id, rank_lex) and a
    * (doc_id, rank_vec) pool — the single-query form ([[hybrid]]). */
  private def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int): DataFrame =
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
        rrfMicro.as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(k)

  /** Per-qid exact integer RRF fusion of (qid, doc_id, rank_lex) and
    * (qid, doc_id, rank_vec) pools — the batched form ([[hybridAnn]] /
    * [[hybridAnnMany]]): the join carries qid, so N queries fuse in ONE
    * job with no driver round-trips, and the per-qid top-k is a rank
    * window over (qid). Pools are ≤ poolK rows per qid by construction,
    * so the window partitions are bounded. */
  private def rrfFusePerQid(lex: DataFrame, vec: DataFrame,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("rrf_micro").desc, col("doc_id"))
    lex.join(vec, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), col("rank_lex"), col("rank_vec"),
        rrfMicro.as("rrf_micro"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
      .orderBy(col("qid"), col("rrf_micro").desc, col("doc_id"))
  }

  /** [[hybrid]] with the VECTOR side served by the persisted
    * [[AnnIndex]] instead of a brute-force corpus scan — the
    * production retrieval stack, both legs build-once/query-many: the
    * lexical pool reads only its terms' posting rows (tpfx directory
    * pruning + token pushdown) and the vector pool reads only the
    * query's probed cells (manifest path pruning), so at 100 TB a
    * hybrid query touches kilobytes of each index and fuses
    * driver-side-free with the same exact integer RRF as [[hybrid]].
    * `nProbes = 1` keeps the vector pool's result contract equal to
    * [[Similarity.ivfKmeansTopK]]'s (the sim_ann_store parity), so the
    * whole fusion stays oracle-exact end to end; raise nProbes for
    * recall once past the oracle. `queries` is (qid, qe) — ANY number
    * of rows since round 15: fusion is PER QID (the RRF join carries
    * qid), so batching N queries is one job, not N driver round-trips,
    * and the round-14 `require(nq == 1)` + its `count()` action are
    * retired (a spec pins multi-query fusion ≡ the per-query loop).
    * Every qid fuses against the SAME `terms` lexical pool here; for
    * per-qid term sets use [[hybridAnnMany]]. Output: (qid, doc_id,
    * rank_lex, rank_vec, rrf_micro), top-k per qid. */
  def hybridAnn(spark: SparkSession, root: String, terms: Seq[String],
      annRoot: String, queries: DataFrame, k: Int = 10,
      poolK: Int = 50, nProbes: Int = 1): DataFrame = {
    val lex = search(spark, root, terms, poolK)
      .select(col("doc_id"), col("rank").as("rank_lex"))
    // the shared lexical pool (≤ poolK rows) broadcasts and replicates
    // per qid — the qid set never collects to the driver
    val qids = queries.select(col("qid").cast("long").as("qid")).distinct()
    val lexQ = qids.crossJoin(broadcast(lex))
    rrfFusePerQid(lexQ, annPool(spark, annRoot, queries, nProbes, poolK), k)
  }

  /** [[hybridAnn]] with PER-QID term sets — the full production batch
    * shape: `termsByQid` drives one [[searchMany]] pass (union-pruned
    * postings scan, per-qid rank window) and the ANN leg serves every
    * qid's probes in one search; fusion joins on (qid, doc_id). Output
    * contract identical to [[hybridAnn]]. */
  def hybridAnnMany(spark: SparkSession, root: String,
      termsByQid: Seq[(Long, Seq[String])], annRoot: String,
      queries: DataFrame, k: Int = 10, poolK: Int = 50,
      nProbes: Int = 1): DataFrame = {
    val lex = searchMany(spark, root, termsByQid, poolK)
      .select(col("qid"), col("doc_id"), col("rank").as("rank_lex"))
    rrfFusePerQid(lex, annPool(spark, annRoot, queries, nProbes, poolK), k)
  }

  /** The ANN leg's (qid, doc_id, rank_vec) pool, shared by both hybrid
    * batch forms. */
  private def annPool(spark: SparkSession, annRoot: String,
      queries: DataFrame, nProbes: Int, poolK: Int): DataFrame =
    AnnIndex.search(spark, annRoot, queries, nProbes, k = poolK)
      .select(col("qid").cast("long").as("qid"),
        col("cid").cast("long").as("doc_id"),
        col("rn").cast("int").as("rank_vec"))
}
