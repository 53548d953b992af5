package graft.operators

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Persisted IVF-PQ index — [[AnnIndex]] with PQ codes instead of raw
  * vectors in the cells: the production billion-vector layout, where
  * the searchable artifact is m small integers per vector (the codes)
  * plus two metadata-sized tables (coarse centroids, residual
  * codebooks), and raw embeddings are never read at query time.
  * [[Similarity.ivfPqTopK]] trains and searches in one query; this is
  * its build-once / query-many form, sharing the same training
  * ([[Similarity.ivfPqParts]]) so a search over a freshly built index
  * equals the in-query operator row-for-row (spec-pinned, and the
  * driver gates it against the same oracle).
  *
  * Layout — the [[AnnIndex]] snapshot discipline:
  * {{{
  *   root/CURRENT             — StateCommit pointer
  *   root/snap-v/meta/        — ONE parquet folding the six logical
  *                              metadata tables (coarse quantizer,
  *                              residual codebooks, params, live-cell
  *                              manifest, stats, drift log),
  *                              discriminated by column `t`
  *   root/gen-v/cell=C/       — IMMUTABLE (vec_id, blk, code) rows
  * }}}
  * (pre-fold snapshots carried per-table dirs — coarse/ codebook/
  * params/ manifest/ stats/ drift/ — and stay readable via the
  * folded-first fallback in `metaTable`)
  *
  * Scale posture: the probe set prunes at the FILE level (manifest →
  * probed cells' directories only), the per-query LUT broadcasts, and
  * candidates contribute only code rows to one combinable sum — at
  * 100 TB the scan is ~m·4 bytes per posted vector in nProbes/nCoarse
  * of the corpus. `upsert` assigns a batch against the PERSISTED
  * quantizer and codebooks (no retrain — the FAISS add path) and
  * rewrites only its touched cells, published atomically; retrain =
  * [[build]], the drift-triggered path.
  */
/** Quantization-drift advisory (see [[AnnIndexPq.driftReport]]):
  * build-time vs recent-upsert mean per-vector quantization error
  * (nano-L2 of residual vs chosen codes, the `err_nano`
  * [[Similarity.ivfPqEncode]] already computes); `drifted` recommends
  * a [[AnnIndexPq.build]] retrain. */
case class PqDriftReport(buildMeanErrNano: Double,
    recentMeanErrNano: Double, nRecent: Long, drifted: Boolean)

object AnnIndexPq {

  private val Coarse = "coarse"
  private val Codebook = "codebook"
  private val Params = "params"
  private val Manifest = "manifest"
  private val Stats = "stats"
  private val Drift = "drift"

  private def genPath(root: String, gen: Long) = s"$root/gen-$gen"
  private def cellDir(root: String, gen: Long, cell: String) =
    s"${genPath(root, gen)}/cell=$cell"

  /** Column superset of the six logical metadata tables — every commit
    * folds them into ONE `meta` parquet (discriminated by column `t`),
    * the [[LexIndex]] folded-commit layout: the six per-table
    * coalesce(1) writes were six driver-side committer rounds per
    * mutation (~0.2–0.3 s each at local[32]), the dominant flat cost of
    * sim_annpq_store/_rerank after round 12 gave LexIndex the same
    * treatment. Readers ([[metaTable]]) take folded-first with the
    * per-table directory as the pre-fold fallback, so time travel
    * across the upgrade keeps working; [[StateCommit.gcGenerations]]
    * already consults the folded manifest by the same precedence. */
  private val MetaCols: Seq[(String, String)] = Seq(
    "ccell" -> "long", "cce" -> "array<double>",
    "blk" -> "int", "cid" -> "long", "ce" -> "array<double>",
    "n_coarse" -> "int", "m" -> "int", "sub_dim" -> "int",
    "n_centroids" -> "int",
    "cell" -> "string", "gen" -> "long",
    "build_mean_err_nano" -> "double", "n" -> "long",
    "seq" -> "long", "mean_err_nano" -> "double")

  private def toMetaRows(t: String, df: DataFrame): DataFrame =
    StateCommit.foldMetaRows(t, df, MetaCols)

  /** This family's logical-table column lists (select order is the
    * reader contract — positional getters depend on it). */
  private[graft] def metaCols(table: String): Seq[String] = table match {
    case Coarse => Seq("ccell", "cce")
    case Codebook => Seq("blk", "cid", "ce")
    case Params => Seq("n_coarse", "m", "sub_dim", "n_centroids")
    case Manifest => Seq("cell", "gen")
    case Stats => Seq("build_mean_err_nano", "n")
    case Drift => Seq("seq", "n", "mean_err_nano")
  }

  /** Read one logical meta table of snapshot `v` — the shared
    * folded-first/per-table-fallback probe ([[StateCommit.metaTable]]). */
  private[graft] def metaTable(spark: SparkSession, root: String,
      v: Long, table: String): DataFrame =
    StateCommit.metaTable(spark, root, v, table, metaCols(table))

  /** Generation GC runs on commits that DROPPED generations from the
    * manifest and otherwise every `spark.graft.ann.gcSweepEvery`-th
    * version — the [[LexIndex]] deferral: with the default retain=2 the
    * dropping commit's predecessor still references the superseded
    * generations, so GC at that commit reclaims nothing anyway, and
    * paying the manifest-read pass per append commit was pure constant.
    * The sweep bounds the transient leak at `gcSweepEvery` commits'
    * worth of superseded dirs. */

  /** Write the folded metadata snapshot and commit; GC per the policy
    * above. `droppedGens` = this commit removed generations from the
    * manifest. */
  private def writeMeta(spark: SparkSession, root: String, v: Long,
      coarse: DataFrame, codebook: DataFrame, params: DataFrame,
      entries: Seq[(String, Long)], stats: DataFrame,
      drift: Seq[(Long, Long, Double)], droppedGens: Boolean): Unit = {
    val s = spark; import s.implicits._
    val meta = Seq(
      toMetaRows(Coarse, coarse),
      toMetaRows(Codebook, codebook),
      toMetaRows(Params, params),
      toMetaRows(Manifest, entries.toDF("cell", "gen")),
      toMetaRows(Stats, stats),
      toMetaRows(Drift, drift.toDF("seq", "n", "mean_err_nano"))
    ).reduce(_.unionByName(_))
    meta.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, "meta"))
    StateCommit.commit(spark, root, v)
    val sweepEvery = graft.GraftConf.long(spark, graft.GraftConf.AnnGcSweepEvery)
    if (droppedGens || (sweepEvery > 0 && v % sweepEvery == 0))
      StateCommit.gcGenerations(spark, root)
  }

  /** Stats rows of snapshot `v` (0 or 1 rows; tolerates pre-monitor
    * snapshots, where the per-table fallback directory is absent). */
  private def statsRows(spark: SparkSession, root: String,
      v: Long): DataFrame = {
    val s = spark; import s.implicits._
    Try(metaTable(spark, root, v, Stats)).getOrElse(
      Seq.empty[(Double, Long)].toDF("build_mean_err_nano", "n"))
  }

  def version(spark: SparkSession, root: String): Long =
    StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed IVF-PQ index at $root (run AnnIndexPq.build first)"))

  /** (nCoarse, m, subDim, nCentroids) locked at build time. */
  def params(spark: SparkSession, root: String): (Int, Int, Int, Int) =
    paramsAt(spark, root, version(spark, root))

  private def paramsAt(spark: SparkSession, root: String,
      v: Long): (Int, Int, Int, Int) = {
    val r = metaTable(spark, root, v, Params).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  private def manifestOf(spark: SparkSession, root: String,
      v: Long): Seq[(String, Long)] =
    metaTable(spark, root, v, Manifest)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

  /** Mean per-vector quantization error (Σ over blocks of the chosen
    * code's nano-L2) and vector count of an encoded assignment —
    * the [[AnnIndex]] drift-monitor shape with err_nano as the stat. */
  private def meanErrOf(assign: DataFrame): (Double, Long) = {
    val r = assign.groupBy("vec_id").agg(sum("nano").as("err"))
      .agg(avg(col("err").cast("double")), count(lit(1))).head()
    (Option(r.get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0), r.getLong(1))
  }

  /** The drift log: one row per upsert since the last build
    * (seq, n, mean_err_nano) — reset by [[build]], carried forward by
    * every other mutation; metadata-sized always. */
  private def readDrift(spark: SparkSession, root: String,
      v: Long): Seq[(Long, Long, Double)] =
    Try(metaTable(spark, root, v, Drift)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1))
      .getOrElse(Seq.empty)

  private def listCellDirs(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell="))
      .sorted
  }

  /** Read exactly `entries`' cell directories — path-level pruning,
    * with each generation read under its own basePath so the `cell`
    * partition column recovers. */
  private def readCells(spark: SparkSession, root: String,
      entries: Seq[(String, Long)]): Option[DataFrame] =
    if (entries.isEmpty) None
    else {
      val parts = entries.groupBy(_._2).toSeq.sortBy(_._1).map { case (g, es) =>
        spark.read.option("basePath", genPath(root, g))
          .parquet(es.map(e => cellDir(root, g, e._1)).sorted: _*)
      }
      val cellT = parts.head.schema("cell").dataType
      Some(parts.map(_.withColumn("cell", col("cell").cast(cellT)))
        .reduce(_.unionByName(_)))
    }

  /** Train coarse quantizer + residual codebooks and persist the
    * cell-partitioned code table as one atomic snapshot. */
  def build(embeddings: DataFrame, root: String, nCoarse: Int = 8,
      m: Int = 8, subDim: Int = 8, nCentroids: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    val s = spark; import s.implicits._
    val prior = StateCommit.currentVersion(spark, root)
    val v = prior.getOrElse(0L) + 1
    val parts = Similarity.ivfPqParts(embeddings, nCoarse, m, subDim,
      nCentroids, materialize = true)
    // the code assignment has two consumers now (cell write + the
    // drift monitor's build-time error stat) — snapshot it so the
    // assignment join/agg doesn't run twice
    val assign = parts.assign.localCheckpoint()
    // the code rows: PQ code per (vector, block), partitioned by the
    // vector's COARSE cell — `cell` is the partition (pruning) column,
    // `code` the payload
    assign.select(col("vec_id"), col("blk"), col("cell").as("code"))
      .join(parts.residuals.select(col("vec_id"), col("ccell").as("cell")),
        Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(genPath(root, v))
    // build-time quantization quality: the drift monitor's reference
    // point (and the drift log resets — a fresh build is un-drifted)
    val (meanErr, n) = meanErrOf(assign)
    writeMeta(spark, root, v,
      coarse = parts.coarse, codebook = parts.cents,
      params = Seq((nCoarse, m, subDim, nCentroids))
        .toDF("n_coarse", "m", "sub_dim", "n_centroids"),
      entries = listCellDirs(spark, genPath(root, v)).map(_ -> v),
      stats = Seq((meanErr, n)).toDF("build_mean_err_nano", "n"),
      drift = Seq.empty,
      // a rebuild over a live index replaces the whole manifest —
      // every prior generation loses its reference
      droppedGens = prior.isDefined)
  }

  /** ADC top-k over the persisted codes. `queries` is (qid, qe); the
    * output contract is [[Similarity.ivfPqTopK]]'s exactly:
    * (qid, cid, adist_nano, rn), nano-BIGINT distances, cid tie-break,
    * self-matches excluded. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      nProbes: Int = 2, k: Int = 5): DataFrame =
    searchAt(spark, root, queries, version(spark, root), nProbes, k)

  /** Time travel: [[search]] as of snapshot `v` — the [[LexIndex
    * .searchAt]] reproducibility contract for the compressed index:
    * every snapshot pins its own quantizer, codebooks, params and
    * manifest, so a retained prior version answers exactly what it
    * answered when current (an upsert's re-encoded rows are invisible
    * to it). Fails loudly outside the retention horizon. */
  def searchAt(spark: SparkSession, root: String, queries: DataFrame,
      v: Long, nProbes: Int = 2, k: Int = 5): DataFrame = {
    StateCommit.requireRetained(spark, root, v)
    val (_, m, subDim, _) = paramsAt(spark, root, v)
    val coarse = metaTable(spark, root, v, Coarse)
    val cents = metaTable(spark, root, v, Codebook)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cnano"), col("ccell"))
    val qprobe = queries.select(col("qid"), col("qe"))
      .crossJoin(broadcast(coarse))
      .select(col("qid"), col("qe"), col("ccell"), col("cce"),
        Similarity.nanoL2(col("qe"), col("cce")).as("cnano"))
      .withColumn("prn", row_number().over(wq)).where(col("prn") <= nProbes)
      .select(col("qid"), col("ccell").as("pcell"),
        zip_with(col("qe"), col("cce"),
          (x, c) => x.cast("double") - c.cast("double")).as("rq"))
      .localCheckpoint() // the probe-cell collect below must not re-run
                         // the caller's query plan
    val rqBlocks = qprobe.select(col("qid"), col("pcell"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        b => slice(col("rq"), b * subDim + 1, lit(subDim)))))
      .select(col("qid"), col("pcell"), col("pos").as("blk"), col("col").as("sub"))
    val lut = rqBlocks.join(broadcast(cents), Seq("blk"))
      .select(col("qid"), col("pcell"), col("blk"), col("cid"),
        Similarity.nanoL2(col("sub"), col("ce")).as("dq"))
    // file-level pruning: only the probed cells' directories are read
    val probed = qprobe.select("pcell").distinct()
      .collect().map(_.get(0).toString).toSet
    val live = manifestOf(spark, root, v).filter(e => probed(e._1))
    readCells(spark, root, live) match {
      case None =>
        spark.range(0).select(col("id").as("qid"), col("id").as("cid"),
          col("id").as("adist_nano"), col("id").cast("int").as("rn"))
      case Some(codes) =>
        val codeRows = codes.select(col("vec_id").as("cid2"),
          col("blk").as("cblk"), col("code"), col("cell").as("vcell"))
        val scored = codeRows
          .join(broadcast(lut),
            col("vcell") === col("pcell") && col("cblk") === col("blk") &&
              col("code") === col("cid"))
          .groupBy(col("qid"), col("cid2").as("cid"))
          .agg(sum("dq").as("adist_nano"))
          .where(col("qid") =!= col("cid"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("adist_nano"), col("cid"))
        scored.withColumn("rn", row_number().over(w))
          .where(col("rn") <= k)
          .select("qid", "cid", "adist_nano", "rn")
          .orderBy("qid", "rn")
    }
  }

  /** Two-stage search — the production IVF-PQ pattern: the codes-only
    * index shortlists `poolK` candidates per query by ADC distance,
    * then ONLY those candidates pay an exact cosine against the raw
    * vectors and the top `k` re-rank by it. The compressed index
    * bounds what is read (probed cells' code rows); the exact pass is
    * an id-keyed equi-join fetching poolK rows per query — never a
    * corpus scan — which is why codes-not-vectors cells stay the right
    * layout even when exact scores are required. Re-ranking can only
    * raise recall vs the ADC ranking (spec-pinned): the shortlist is
    * unchanged, and within it the true metric replaces the
    * quantization-error-afflicted estimate. */
  def searchRerank(spark: SparkSession, root: String, queries: DataFrame,
      vectors: DataFrame, nProbes: Int = 2, k: Int = 5,
      poolK: Int = 20): DataFrame = {
    val shortlist = search(spark, root, queries, nProbes, poolK)
      .select(col("qid"), col("cid"))
    val q = queries.select(col("qid"), col("qe"))
    val cand = vectors.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    shortlist
      .join(cand, Seq("cid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("cid"),
        round(Similarity.cos(vectors)(col("ce"), col("qe")), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Incremental add between retrains: encode `batch` against the
    * PERSISTED quantizer and codebooks and rewrite only its touched
    * cells (kept rows + incoming, id-keyed replace), published
    * atomically. No retraining — drift is [[build]]'s trigger. */
  def upsert(spark: SparkSession, root: String, rawBatch: DataFrame,
      seqCol: String = ""): Unit = {
    val v0 = version(spark, root)
    val v = v0 + 1
    // last-wins collapse: duplicate vec_ids within one CDC batch would
    // each encode and land in the new generation (the incoming-id
    // anti-join removes only prior-generation rows)
    val batch = CdcBatch.collapse(rawBatch, "vec_id", seqCol)
    val (_, m, subDim, _) = params(spark, root)
    val coarse = metaTable(spark, root, v0, Coarse)
    val cents = metaTable(spark, root, v0, Codebook)
    val residuals = Similarity.assignCoarse(batch, coarse)
      .select(col("vec_id"), col("ccell"),
        zip_with(col("embedding"), col("cce"),
          (x, c) => x.cast("double") - c.cast("double")).as("embedding"))
      .localCheckpoint() // touched-cell collect + code write share it
    val encoded = Similarity
      .pqNearest(Similarity.pqBlocks(
        residuals.select("vec_id", "embedding"), m, subDim), cents)
      .localCheckpoint() // drift stat + code write share it
    // drift signal: this batch's quantization error vs build time (the
    // err_nano ivfPqEncode emits, per incoming batch)
    val (batchMeanErr, batchN) = meanErrOf(encoded)
    val incoming = encoded
      .select(col("vec_id"), col("blk"), col("cell").as("code"))
      .join(residuals.select(col("vec_id"), col("ccell").as("cell")),
        Seq("vec_id"))
    val touched = residuals.select(col("ccell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val live = manifestOf(spark, root, v0)
    val existing = live.filter(e => touched(e._1))
    val newGen = readCells(spark, root, existing) match {
      case None => incoming
      case Some(kept) =>
        val incomingIds = residuals.select(col("vec_id")).distinct()
        kept.select(col("vec_id"), col("blk"), col("code"), col("cell"))
          .join(incomingIds, Seq("vec_id"), "left_anti")
          .unionByName(incoming)
    }
    newGen.write.mode("overwrite").partitionBy("cell")
      .parquet(genPath(root, v))
    // the immutable tables carry into the new snapshot (lazy reads of
    // v0's meta feeding v's single folded write) so the pointer swap
    // publishes quantizer + codes together
    val written = listCellDirs(spark, genPath(root, v))
    val entries = live.filterNot(e => touched(e._1)) ++ written.map(_ -> v)
    writeMeta(spark, root, v,
      // reuse the in-scope v0 reads (coarse/cents) — re-probing the
      // same snap-v0 meta file per table was pure footer-read waste
      coarse = coarse,
      codebook = cents,
      params = metaTable(spark, root, v0, Params),
      entries = entries,
      stats = statsRows(spark, root, v0),
      drift = readDrift(spark, root, v0) :+ ((v, batchN, batchMeanErr)),
      droppedGens =
        live.map(_._2).toSet.diff(entries.map(_._2).toSet).nonEmpty)
  }

  /** Delete by id — locate the victims' cells with one id semi-join
    * over the live code rows (ids are not the partition key, so this
    * scans the id column — m small rows per vector), then write ONLY
    * those cells' survivors as a fresh generation. A cell emptied by
    * the delete drops out of the manifest; absent ids are no-ops;
    * replays converge (the [[AnnIndex.delete]] shape over codes). */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Unit = {
    val v0 = version(spark, root)
    val live = manifestOf(spark, root, v0)
    val victims = ids.select(col("vec_id"))
    val touched = readCells(spark, root, live) match {
      case None => Set.empty[String]
      case Some(raw) => raw.join(victims, Seq("vec_id"), "left_semi")
        .select("cell").distinct().collect().map(_.get(0).toString).toSet
    }
    if (touched.isEmpty) return
    val v = v0 + 1
    readCells(spark, root, live.filter(e => touched(e._1))).foreach { t =>
      t.join(victims, Seq("vec_id"), "left_anti")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(genPath(root, v))
    }
    val entries = listCellDirs(spark, genPath(root, v)).map(_ -> v) ++
      live.filterNot(e => touched(e._1))
    writeMeta(spark, root, v,
      coarse = metaTable(spark, root, v0, Coarse),
      codebook = metaTable(spark, root, v0, Codebook),
      params = metaTable(spark, root, v0, Params),
      entries = entries,
      stats = statsRows(spark, root, v0),
      drift = readDrift(spark, root, v0),
      droppedGens =
        live.map(_._2).toSet.diff(entries.map(_._2).toSet).nonEmpty)
  }

  /** Small-file compaction: rewrite every live cell as one file in a
    * single fresh generation (content-neutral — spec checks probes are
    * unchanged). Run when upsert/delete churn has fragmented cells. */
  def compact(spark: SparkSession, root: String): Unit = {
    val v0 = version(spark, root)
    val live = manifestOf(spark, root, v0)
    readCells(spark, root, live).foreach { raw =>
      val v = v0 + 1
      raw.repartition(col("cell")).sortWithinPartitions("cell", "vec_id", "blk")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(genPath(root, v))
      writeMeta(spark, root, v,
        coarse = metaTable(spark, root, v0, Coarse),
        codebook = metaTable(spark, root, v0, Codebook),
        params = metaTable(spark, root, v0, Params),
        entries = listCellDirs(spark, genPath(root, v)).map(_ -> v),
        stats = statsRows(spark, root, v0),
        drift = readDrift(spark, root, v0),
        // a compaction rewrites every live cell — all prior
        // generations lose their references
        droppedGens = live.map(_._2).toSet.exists(_ != v))
    }
  }

  /** Drift advisory for the incremental add path — the [[AnnIndex
    * .driftReport]] trigger with QUANTIZATION ERROR as the monitored
    * stat: [[upsert]] encodes against the PERSISTED quantizer and
    * codebooks, so when the feed's distribution shifts, incoming
    * residuals stop landing near any code and the batch's mean
    * err_nano rises above the build-time reference — the cheap,
    * already-computed signal that the FAISS retrain side ([[build]])
    * is due. Returns None before the first post-build upsert.
    *
    * Calibrating `ratio`: the build-time mean is IN-SAMPLE (codebooks
    * trained on those exact residuals), so a stationary feed sits a
    * generalization gap ABOVE it — measure the gap once with a
    * stationary holdout right after a build (~1.1–1.3x on this repo's
    * synthetic embeddings) and set `ratio` above it; a true shift
    * lands far outside (the spec's scaled feed exceeds 5x). `lastK`
    * bounds the window to the most recent batches (row-weighted), so
    * one early clean batch cannot mask a later shift. `floorNano`
    * de-degenerates the ratio test when the build fit is essentially
    * perfect (build mean ~0 — the codes coincide with the vectors):
    * without a floor, `recent > 0 * ratio` would fire on ANY nonzero
    * batch; below the floor, error differences are quantization noise
    * (1e-3 of a unit-vector's nano-L2 scale by default). */
  def driftReport(spark: SparkSession, root: String,
      ratio: Double = 1.5, lastK: Int = 5,
      floorNano: Double = 1e6): Option[PqDriftReport] = {
    val v = version(spark, root)
    val stats = Try(metaTable(spark, root, v, Stats).head()).toOption
    val drift = readDrift(spark, root, v).takeRight(lastK)
    for (s <- stats if drift.nonEmpty) yield {
      val buildMean = s.getDouble(0)
      val n = drift.map(_._2).sum
      val recent =
        if (n == 0L) buildMean
        else drift.map(d => d._3 * d._2).sum / n
      PqDriftReport(buildMean, recent, n,
        recent > math.max(buildMean, floorNano) * ratio)
    }
  }
}
