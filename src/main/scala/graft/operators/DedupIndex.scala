package graft.operators

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Persisted MinHash-LSH dedup index — the build-once / probe-many
  * form of [[Dedup.incrementalDedup]]: a real curation pipeline dedups
  * every INCOMING batch against the accumulated corpus, and recomputing
  * the corpus's band signatures per batch is a full corpus scan each
  * time. This index persists the signatures once and lets each batch
  * pay only its own signature pass plus a broadcast probe.
  *
  * == Layout: the [[AnnIndex]] snapshot discipline ==
  *
  * {{{
  *   root/CURRENT            — StateCommit pointer: committed version
  *   root/snap-v/meta/       — ONE parquet folding the three logical
  *                             metadata tables (the k/r scheme, the
  *                             live-generation manifest, the
  *                             tombstones), discriminated by column `t`
  *   root/gen-v/bands/       — IMMUTABLE (doc_id, band, sig) rows of mutation v
  *   root/gen-v/sigs/        — IMMUTABLE (doc_id, mh0..mh{k-1}) of mutation v
  * }}}
  * (pre-fold snapshots carried per-table dirs — meta/ holding only the
  * k/r scheme, manifest/, tombstones/ — and stay readable via the
  * schema-probed folded-first fallback in `metaTable`)
  *
  * Generations are append-only and immutable; replacement and deletion
  * are TOMBSTONES (the Iceberg/Delta delete-file move): an upsert of an
  * existing id writes the new rows into its own generation and marks
  * the old ones dead with `before_gen = v`; a delete marks
  * `before_gen = Long.MaxValue`; a later upsert of a deleted id
  * replaces the tombstone, resurrecting the doc. Every mutation
  * publishes manifest + tombstones (+ carried meta) with ONE atomic
  * [[StateCommit.commit]] pointer swap, so readers see a mutation in
  * full or not at all, and a crash leaves only unreferenced directories
  * the deterministic replay overwrites. [[compact]] folds the live rows
  * into a single generation and clears the tombstones — run it when the
  * tombstone table (bounded by churn, not corpus size) stops being
  * metadata-sized.
  *
  * Scale posture: the index never shuffles at query time — the incoming
  * batch's band table (batch-sized) BROADCASTS into a map-side hash
  * join against the index scan, so probing a 100 TB corpus with a
  * 1 GB batch reads the index once and shuffles nothing but candidate
  * pairs. Mutations cost one signature pass over their own rows plus a
  * metadata-sized snapshot write; nothing ever rewrites the corpus.
  * Signature semantics are exactly [[Dedup.lshBands]] /
  * [[Dedup.minhashWide]] — the driver gate runs the probe against the
  * same DuckDB band-chain oracle as dd_lsh_pairs.
  */
object DedupIndex {

  private val Meta = "meta"
  private val Manifest = "manifest"
  private val Tombstones = "tombstones"
  private val DeleteAll = Long.MaxValue

  private def genPath(root: String, gen: Long) = s"$root/gen-$gen"
  private def bandsDir(root: String, gen: Long) = s"${genPath(root, gen)}/bands"
  private def sigsDir(root: String, gen: Long) = s"${genPath(root, gen)}/sigs"

  /** The committed snapshot version; mutations bump it by one. */
  def version(spark: SparkSession, root: String): Long =
    StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed dedup index at $root (run DedupIndex.build first)"))

  /** The signature scheme locked at build time. */
  def scheme(spark: SparkSession, root: String): (Int, Int) =
    schemeAt(spark, root, version(spark, root))

  /** Column superset of the three logical metadata tables — every
    * commit folds them into ONE `meta` parquet (discriminated by
    * column `t`), the [[LexIndex]]/[[AnnIndex]]/[[AnnIndexPq]]
    * folded-commit layout: three per-table coalesce(1) writes per
    * mutation were three driver-side committer rounds of flat cost on
    * every probe-and-ingest cycle. The PRE-fold layout also kept a
    * table at `snap-v/meta` (the k/r scheme, no `t` column), so the
    * layout probe checks the SCHEMA, not existence alone — exactly the
    * discrimination [[StateCommit.gcGenerations]] already applies to
    * this family. */
  private val MetaCols: Seq[(String, String)] = Seq(
    "k" -> "int", "r" -> "int",
    "gen" -> "long", "n_docs" -> "long",
    "doc_id" -> "long", "before_gen" -> "long")

  private def toMetaRows(t: String, df: DataFrame): DataFrame =
    StateCommit.foldMetaRows(t, df, MetaCols)

  /** This family's logical-table column lists (select order is the
    * reader contract). */
  private[graft] def metaCols(table: String): Seq[String] = table match {
    case Meta => Seq("k", "r")
    case Manifest => Seq("gen", "n_docs")
    case Tombstones => Seq("doc_id", "before_gen")
  }

  /** Read one logical meta table of snapshot `v` — the shared
    * schema-probed folded-first/per-table-fallback probe
    * ([[StateCommit.metaTable]]; the schema probe matters HERE because
    * the pre-fold layout's k/r scheme table was also named `meta`). */
  private[graft] def metaTable(spark: SparkSession, root: String,
      v: Long, table: String): DataFrame =
    StateCommit.metaTable(spark, root, v, table, metaCols(table))

  /** GC deferral — see [[AnnIndexPq]]: reclaim on generation-dropping
    * commits plus a periodic sweep (`spark.graft.dedup.gcSweepEvery`).
    * Append commits (upsert/delete keep every prior generation) reclaim
    * nothing under retain=2 anyway — the per-commit pass was pure
    * constant. */

  /** Write the folded metadata snapshot and commit; GC per the policy
    * above. */
  private def writeMetaTables(spark: SparkSession, root: String, v: Long,
      k: Int, r: Int, entries: Seq[(Long, Long)], tombstones: DataFrame,
      droppedGens: Boolean): Unit = {
    val s = spark; import s.implicits._
    val meta = Seq(
      toMetaRows(Meta, Seq((k, r)).toDF("k", "r")),
      toMetaRows(Manifest, entries.toDF("gen", "n_docs")),
      toMetaRows(Tombstones, tombstones
        .select(col("doc_id").cast("long"), col("before_gen").cast("long")))
    ).reduce(_.unionByName(_))
    meta.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, "meta"))
    StateCommit.commit(spark, root, v)
    val sweepEvery = graft.GraftConf.long(spark, graft.GraftConf.DedupGcSweepEvery)
    if (droppedGens || (sweepEvery > 0 && v % sweepEvery == 0))
      StateCommit.gcGenerations(spark, root)
  }

  private def manifestOf(spark: SparkSession, root: String,
      v: Long): Seq[(Long, Long)] =
    metaTable(spark, root, v, Manifest)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  private def tombstonesOf(spark: SparkSession, root: String,
      v: Long): DataFrame =
    metaTable(spark, root, v, Tombstones)

  private def emptyTombstones(spark: SparkSession): DataFrame = {
    val s = spark; import s.implicits._
    Seq.empty[(Long, Long)].toDF("doc_id", "before_gen")
  }

  /** Tombstones for snapshot v: prior entries for ids NOT touched by
    * this mutation, plus one fresh entry per touched id. Replacing (not
    * max-merging) makes the LAST mutation win — delete-then-upsert
    * resurrects, upsert-then-delete stays dead. */
  private def mergedTombstones(prior: DataFrame, touchedIds: DataFrame,
      beforeGen: Long): DataFrame =
    prior.join(touchedIds, Seq("doc_id"), "left_anti")
      .unionByName(touchedIds.select(col("doc_id"),
        lit(beforeGen).as("before_gen")))

  /** One signature pass over `documents`: (bands, sigs) with a `gen`
    * column to write. Signature semantics are the dedup suite's. */
  private def signatures(documents: DataFrame, k: Int,
      r: Int): (DataFrame, DataFrame) =
    (Dedup.lshBands(documents, k, r), Dedup.minhashWide(documents, k))

  private def writeGen(spark: SparkSession, root: String, v: Long,
      documents: DataFrame, k: Int, r: Int): Long = {
    val (bands, sigs) = signatures(documents, k, r)
    bands.write.mode("overwrite").parquet(bandsDir(root, v))
    sigs.write.mode("overwrite").parquet(sigsDir(root, v))
    spark.read.parquet(sigsDir(root, v)).count()
  }

  /** Union of the live generations' `sub` tables with a `gen` column,
    * tombstone filter applied. The tombstone table broadcasts —
    * bounded by churn since the last compaction, never corpus-sized. */
  private def liveRows(spark: SparkSession, root: String, v: Long,
      sub: String => String): DataFrame = {
    val gens = manifestOf(spark, root, v)
    require(gens.nonEmpty, s"empty manifest for $root snap-$v")
    val unioned = gens.map { case (g, _) =>
      spark.read.parquet(sub(s"${genPath(root, g)}"))
        .withColumn("gen", lit(g))
    }.reduce(_.unionByName(_))
    val dead = tombstonesOf(spark, root, v)
    unioned.join(broadcast(dead), Seq("doc_id"), "left_outer")
      .where(col("before_gen").isNull || col("gen") >= col("before_gen"))
      .drop("before_gen")
  }

  /** All live band rows: (doc_id, band, sig, gen). */
  def bands(spark: SparkSession, root: String): DataFrame =
    liveRows(spark, root, version(spark, root), p => s"$p/bands")

  /** All live wide signatures: (doc_id, mh0..mh{k-1}, gen). */
  def sigs(spark: SparkSession, root: String): DataFrame =
    liveRows(spark, root, version(spark, root), p => s"$p/sigs")

  private def schemeAt(spark: SparkSession, root: String,
      v: Long): (Int, Int) = {
    val r = metaTable(spark, root, v, Meta).head()
    (r.getInt(0), r.getInt(1))
  }

  /** Index the corpus from scratch: one signature pass, one generation,
    * empty tombstones, atomic publish. Re-building over a live root
    * replaces everything in one commit. */
  def build(documents: DataFrame, root: String, k: Int = 16,
      r: Int = 4): Unit = {
    val spark = documents.sparkSession
    val prior = StateCommit.currentVersion(spark, root)
    val v = prior.getOrElse(0L) + 1
    val n = writeGen(spark, root, v, documents, k, r)
    writeMetaTables(spark, root, v, k, r, Seq(v -> n),
      emptyTombstones(spark),
      // a rebuild replaces the whole manifest — every prior generation
      // loses its reference
      droppedGens = prior.isDefined)
  }

  /** Add (or replace) a batch: one signature pass over the BATCH only,
    * appended as its own generation; prior rows of the batch's ids die
    * by tombstone. The corpus is never rescanned or rewritten. */
  def upsert(spark: SparkSession, root: String, rawBatch: DataFrame,
      seqCol: String = ""): Unit = {
    val v0 = version(spark, root)
    val v = v0 + 1
    val (k, r) = scheme(spark, root)
    // last-wins collapse: two versions of one doc in a CDC batch would
    // otherwise minhash a CHIMERA of both texts (the per-doc signature
    // groupBy unions their shingles). Snapped: writeGen's signature
    // derivation and the tombstone id scan below both read it, and the
    // collapse shuffle plus the caller's source plan must run once
    val batch = Stage.snap(CdcBatch.collapse(rawBatch, "doc_id", seqCol),
      materialize = true)
    writeGen(spark, root, v, batch, k, r)
    // tombstone EVERY incoming id, not just signature-bearing ones: a
    // doc shrunk below the 3-token shingle floor must still shed its
    // old signatures
    val ids = batch.select(col("doc_id").cast("long")).distinct()
    writeMetaTables(spark, root, v, k, r,
      manifestOf(spark, root, v0) :+
        (v -> spark.read.parquet(sigsDir(root, v)).count()),
      mergedTombstones(tombstonesOf(spark, root, v0), ids, beforeGen = v),
      droppedGens = false) // append-only: every prior generation survives
  }

  /** Drop documents from the index (metadata-only: one tombstone row
    * per id, no data rewrite). */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Unit = {
    val v0 = version(spark, root)
    val v = v0 + 1
    val idRows = ids.select(col("doc_id").cast("long")).distinct()
    val (k, r) = scheme(spark, root)
    writeMetaTables(spark, root, v, k, r, manifestOf(spark, root, v0),
      mergedTombstones(tombstonesOf(spark, root, v0), idRows, DeleteAll),
      droppedGens = false) // metadata-only: the manifest is unchanged
  }

  /** Fold the live rows into ONE generation and clear the tombstones —
    * run when churn has made the generation list or tombstone table
    * worth collapsing. Superseded generations die at the next
    * generation-DROPPING commit or periodic sweep (the previous
    * snapshot survives one retention round for in-flight readers, the
    * [[StateCommit]] stance; see the GC-deferral note above). */
  def compact(spark: SparkSession, root: String): Unit = {
    val v0 = version(spark, root)
    val v = v0 + 1
    liveRows(spark, root, v0, p => s"$p/bands").drop("gen")
      .write.mode("overwrite").parquet(bandsDir(root, v))
    liveRows(spark, root, v0, p => s"$p/sigs").drop("gen")
      .write.mode("overwrite").parquet(sigsDir(root, v))
    val (k, r) = scheme(spark, root)
    writeMetaTables(spark, root, v, k, r,
      Seq(v -> spark.read.parquet(sigsDir(root, v)).count()),
      emptyTombstones(spark),
      // the fold replaces every prior generation's reference
      droppedGens = true)
  }

  /** Near-dup candidates of an INCOMING batch against the index:
    * (doc_id [incoming], dup_id [indexed], n_sig_match) — candidates
    * from the band equi-join (never all-pairs), n_sig_match = how many
    * of the k minhashes agree (k·J/(2−J) expected under Jaccard J; the
    * verification signal a curation pipeline thresholds on).
    *
    * The batch side computes its own signatures in-flight and
    * BROADCASTS them — the index scan joins map-side, so the corpus
    * never shuffles. Self-matches (same id on both sides) are excluded:
    * a re-probed doc is its own trivial dup. */
  def queryNearDups(spark: SparkSession, root: String,
      incoming: DataFrame): DataFrame =
    queryNearDupsAt(spark, root, incoming, version(spark, root))

  /** Time travel: [[queryNearDups]] as of snapshot `v` — every snapshot
    * pins its own manifest/tombstones/scheme, so a probe against a
    * RETAINED prior version (pre-delete, pre-upsert) answers exactly
    * what it answered when that version was current. Fails loudly
    * outside the retention horizon. */
  def queryNearDupsAt(spark: SparkSession, root: String,
      incoming: DataFrame, v: Long): DataFrame = {
    StateCommit.requireRetained(spark, root, v)
    val (k, r) = schemeAt(spark, root, v)
    val (qBands, qSigs) = signatures(incoming, k, r)
    val cand = liveRows(spark, root, v, p => s"$p/bands")
      .select(col("doc_id").as("dup_id"), col("band"), col("sig"))
      .join(broadcast(qBands), Seq("band", "sig"))
      .where(col("doc_id") =!= col("dup_id"))
      .select("doc_id", "dup_id").distinct()
    val matchCount = (0 until k).map(j =>
      when(col(s"mh$j") === col(s"q$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val qWide = qSigs.select(col("doc_id") +:
      (0 until k).map(j => col(s"mh$j").as(s"q$j")): _*)
    cand
      .join(broadcast(qWide), Seq("doc_id"))
      .join(liveRows(spark, root, v, p => s"$p/sigs")
        .withColumnRenamed("doc_id", "dup_id")
        .drop("gen"), Seq("dup_id"))
      .select(col("doc_id"), col("dup_id"),
        matchCount.as("n_sig_match"))
      .orderBy("doc_id", "dup_id")
  }

  /** Per-document curation verdicts for an incoming batch against the
    * index: (doc_id, n_candidates, best_dup_id, best_sig_match,
    * verdict) with verdict ∈ new / near_dup / likely_exact
    * (likely_exact = some indexed doc agrees on ALL k minhashes — the
    * signature-level "same content" signal; byte-level certainty is
    * [[Dedup.exact]]'s job). best_dup_id breaks sig-match ties to the
    * smallest id, deterministically. One row per incoming doc, docs
    * below the shingle floor included as `new` — the drop/keep list a
    * streaming curation pass applies.
    *
    * Same scale posture as [[queryNearDups]] (which this aggregates):
    * batch-side broadcast probe, no corpus shuffle. */
  def classifyBatch(spark: SparkSession, root: String,
      incoming: DataFrame): DataFrame =
    classifyBatchAt(spark, root, incoming, version(spark, root))

  /** Time travel: [[classifyBatch]] against snapshot `v` — reproduces a
    * past curation decision exactly (the verdicts a batch received when
    * `v` was current, before later deletes/upserts moved the index). */
  def classifyBatchAt(spark: SparkSession, root: String,
      incoming: DataFrame, v: Long): DataFrame = {
    StateCommit.requireRetained(spark, root, v)
    val (k, _) = schemeAt(spark, root, v)
    // "seen BEFORE this batch": exclude the batch's own ids from the
    // candidate side — without this, an at-least-once replay (whose
    // first delivery already upserted the batch) would suddenly see
    // intra-batch twins as dups and flip their verdicts, breaking
    // replay convergence (StreamingDedupSpec pins the twin case)
    val ownIds = incoming.select(col("doc_id").cast("long").as("dup_id"))
      .distinct()
    val cand = queryNearDupsAt(spark, root, incoming, v)
      .join(broadcast(ownIds), Seq("dup_id"), "left_anti")
    val best = cand.groupBy("doc_id")
      .agg(countDistinct("dup_id").as("n_candidates"),
        max(struct(col("n_sig_match"), (-col("dup_id")).as("nd"))).as("m"))
      .select(col("doc_id"), col("n_candidates"),
        (-col("m.nd")).as("best_dup_id"),
        col("m.n_sig_match").as("best_sig_match"))
    incoming.select(col("doc_id").cast("long")).distinct()
      .join(best, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_dup_id"),
        coalesce(col("best_sig_match"), lit(0L)).as("best_sig_match"))
      .withColumn("verdict",
        when(col("n_candidates") === 0, "new")
          .when(col("best_sig_match") === k, "likely_exact")
          .otherwise("near_dup"))
      .orderBy("doc_id")
  }
}
