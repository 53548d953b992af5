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
  *   root/snap-v/coarse/      — (ccell, cce): coarse quantizer
  *   root/snap-v/codebook/    — (blk, cid, ce): residual PQ codebooks
  *   root/snap-v/params/      — (n_coarse, m, sub_dim, n_centroids)
  *   root/snap-v/manifest/    — live-cell map: (cell, gen)
  *   root/gen-v/cell=C/       — IMMUTABLE (vec_id, blk, code) rows
  * }}}
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

  def version(spark: SparkSession, root: String): Long =
    StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed IVF-PQ index at $root (run AnnIndexPq.build first)"))

  /** (nCoarse, m, subDim, nCentroids) locked at build time. */
  def params(spark: SparkSession, root: String): (Int, Int, Int, Int) =
    paramsAt(spark, root, version(spark, root))

  private def paramsAt(spark: SparkSession, root: String,
      v: Long): (Int, Int, Int, Int) = {
    val r = spark.read.parquet(
      StateCommit.tableDir(root, v, Params)).head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  private def manifestOf(spark: SparkSession, root: String,
      v: Long): Seq[(String, Long)] =
    spark.read.parquet(StateCommit.tableDir(root, v, Manifest))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

  private def writeManifest(spark: SparkSession, root: String, v: Long,
      entries: Seq[(String, Long)]): Unit = {
    val s = spark; import s.implicits._
    entries.toDF("cell", "gen").coalesce(1)
      .write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, Manifest))
  }

  /** Mean per-vector quantization error (Σ over blocks of the chosen
    * code's nano-L2) and vector count of an encoded assignment —
    * the [[AnnIndex]] drift-monitor shape with err_nano as the stat. */
  private def meanErrOf(assign: DataFrame): (Double, Long) = {
    val r = assign.groupBy("vec_id").agg(sum("nano").as("err"))
      .agg(avg(col("err").cast("double")), count(lit(1))).head()
    (Option(r.get(0)).map(_.asInstanceOf[Double]).getOrElse(0.0), r.getLong(1))
  }

  private def writeStats(spark: SparkSession, root: String, v: Long,
      meanErr: Double, n: Long): Unit = {
    val s = spark; import s.implicits._
    Seq((meanErr, n)).toDF("build_mean_err_nano", "n").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Stats))
  }

  /** One row per upsert since the last build (seq, n, mean_err_nano) —
    * reset by [[build]], carried forward by every other mutation;
    * metadata-sized always. */
  private def writeDrift(spark: SparkSession, root: String, v: Long,
      rows: Seq[(Long, Long, Double)]): Unit = {
    val s = spark; import s.implicits._
    rows.toDF("seq", "n", "mean_err_nano").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Drift))
  }

  private def readDrift(spark: SparkSession, root: String,
      v: Long): Seq[(Long, Long, Double)] =
    Try(spark.read.parquet(StateCommit.tableDir(root, v, Drift))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1))
      .getOrElse(Seq.empty)

  /** Carry the stats row and drift log from snapshot `from` into
    * snapshot `to`, optionally appending one drift row for the
    * mutation creating `to`. Tolerates pre-monitor snapshots. */
  private def carryMonitor(spark: SparkSession, root: String,
      from: Long, to: Long,
      appendDrift: Option[(Long, Double)] = None): Unit = {
    Try {
      spark.read.parquet(StateCommit.tableDir(root, from, Stats))
        .coalesce(1).write.mode("overwrite")
        .parquet(StateCommit.tableDir(root, to, Stats))
    }
    writeDrift(spark, root, to,
      readDrift(spark, root, from) ++
        appendDrift.map { case (n, m) => (to, n, m) })
  }

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
    val v = StateCommit.currentVersion(spark, root).getOrElse(0L) + 1
    val parts = Similarity.ivfPqParts(embeddings, nCoarse, m, subDim,
      nCentroids, materialize = true)
    // the code assignment has two consumers now (cell write + the
    // drift monitor's build-time error stat) — snapshot it so the
    // assignment join/agg doesn't run twice
    val assign = parts.assign.localCheckpoint()
    parts.coarse.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, Coarse))
    parts.cents.coalesce(1).write.mode("overwrite")
      .parquet(StateCommit.tableDir(root, v, Codebook))
    Seq((nCoarse, m, subDim, nCentroids))
      .toDF("n_coarse", "m", "sub_dim", "n_centroids").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Params))
    // the code rows: PQ code per (vector, block), partitioned by the
    // vector's COARSE cell — `cell` is the partition (pruning) column,
    // `code` the payload
    assign.select(col("vec_id"), col("blk"), col("cell").as("code"))
      .join(parts.residuals.select(col("vec_id"), col("ccell").as("cell")),
        Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(genPath(root, v))
    writeManifest(spark, root, v,
      listCellDirs(spark, genPath(root, v)).map(_ -> v))
    // build-time quantization quality: the drift monitor's reference
    // point (and the drift log resets — a fresh build is un-drifted)
    val (meanErr, n) = meanErrOf(assign)
    writeStats(spark, root, v, meanErr, n)
    writeDrift(spark, root, v, Seq.empty)
    StateCommit.commit(spark, root, v)
    gcGenerations(spark, root)
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
    val coarse = spark.read.parquet(StateCommit.tableDir(root, v, Coarse))
    val cents = spark.read.parquet(StateCommit.tableDir(root, v, Codebook))
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
    val coarse = spark.read.parquet(StateCommit.tableDir(root, v0, Coarse))
    val cents = spark.read.parquet(StateCommit.tableDir(root, v0, Codebook))
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
    // carry the immutable tables into the new snapshot so the pointer
    // swap publishes quantizer + codes together
    Seq(Coarse, Codebook, Params).foreach { t =>
      spark.read.parquet(StateCommit.tableDir(root, v0, t))
        .coalesce(1).write.mode("overwrite")
        .parquet(StateCommit.tableDir(root, v, t))
    }
    carryMonitor(spark, root, v0, v,
      appendDrift = Some((batchN, batchMeanErr)))
    val written = listCellDirs(spark, genPath(root, v))
    writeManifest(spark, root, v,
      live.filterNot(e => touched(e._1)) ++ written.map(_ -> v))
    StateCommit.commit(spark, root, v)
    gcGenerations(spark, root)
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
    Seq(Coarse, Codebook, Params).foreach { t =>
      spark.read.parquet(StateCommit.tableDir(root, v0, t))
        .coalesce(1).write.mode("overwrite")
        .parquet(StateCommit.tableDir(root, v, t))
    }
    carryMonitor(spark, root, v0, v)
    writeManifest(spark, root, v,
      listCellDirs(spark, genPath(root, v)).map(_ -> v) ++
        live.filterNot(e => touched(e._1)))
    StateCommit.commit(spark, root, v)
    gcGenerations(spark, root)
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
      Seq(Coarse, Codebook, Params).foreach { t =>
        spark.read.parquet(StateCommit.tableDir(root, v0, t))
          .coalesce(1).write.mode("overwrite")
          .parquet(StateCommit.tableDir(root, v, t))
      }
      carryMonitor(spark, root, v0, v)
      writeManifest(spark, root, v,
        listCellDirs(spark, genPath(root, v)).map(_ -> v))
      StateCommit.commit(spark, root, v)
      gcGenerations(spark, root)
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
    val stats = Try(
        spark.read.parquet(StateCommit.tableDir(root, v, Stats)).head())
      .toOption
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

  /** Shared fail-safe reclaim — see [[StateCommit.gcGenerations]]. */
  private def gcGenerations(spark: SparkSession, root: String): Unit =
    StateCommit.gcGenerations(spark, root)
}
