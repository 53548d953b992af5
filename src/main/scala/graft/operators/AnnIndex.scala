package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / query-many form of
  * [[Similarity.ivfKmeansTopK]], which trains and scans in the same
  * query. A real corpus builds its index once and serves many query
  * batches, and the index layout is what makes that cheap at 100 TB:
  *
  *   root/centroids/  — the trained coarse quantizer (tiny: nCells rows)
  *   root/vectors/    — every (vec_id, embedding) PARTITIONED BY cell
  *
  * The query path reads the centroid table (broadcast-size), ranks each
  * query's probe cells against it map-only, and then reads ONLY the
  * probed cells' partitions — the `cell IN (…)` predicate is a parquet
  * PARTITION filter (plan-gated), so a 1000-executor scan touches
  * nProbes/nCells of the corpus directories and no more. That is the
  * IVF contract made physical: pruning happens at the FILE level before
  * any task is scheduled, not per-row.
  *
  * The probe-cell list collects to the driver to form the pushable IN
  * filter — bounded by nQueries × nProbes ints, the standard
  * query-time partition-pruning shape (not a data collect).
  *
  * Training is [[Similarity.trainCentroids]] — the SAME quantizer as
  * the in-query operator, so `search(nProbes = 1)` over an index built
  * from a corpus must equal `ivfKmeansTopK` over that corpus
  * row-for-row (spec-gated, and the driver gate runs it as
  * sim_ann_store against the ivf-kmeans oracle).
  */
object AnnIndex {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def vectorsPath(root: String) = s"$root/vectors"

  /** Train the coarse quantizer and persist the cell-partitioned
    * vector table. The assignment pass reads the PERSISTED centroids,
    * so build and search rank against bit-identical values. */
  def build(embeddings: DataFrame, root: String, nCells: Int = 8): Unit = {
    val spark = embeddings.sparkSession
    Similarity.trainCentroids(embeddings, nCells)
      .write.mode("overwrite").parquet(centroidsPath(root))
    val cents = spark.read.parquet(centroidsPath(root))
    Similarity.assignCells(embeddings, cents)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(vectorsPath(root))
  }

  /** Top-k bucket search over a built index. `queries` is (qid, qe);
    * each query probes its `nProbes` nearest cells. Output contract is
    * [[Similarity.ivfKmeansTopK]]'s: (qid, cid, cos, rn), 6-dp-rounded
    * cosine, cid tie-break, self-matches excluded. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      nProbes: Int = 1, k: Int = 5): DataFrame = {
    val cents = spark.read.parquet(centroidsPath(root))
    val raw = spark.read.parquet(vectorsPath(root))
    // partition-column type is inferred from the directory names — cast
    // the probe side to the READ type so the IN list prunes partitions
    // instead of planning a cast-wrapped row filter
    val cellType = raw.schema("cell").dataType
    val probes = Similarity.rankAgainst(
        queries.select(col("qid").as("vec_id"), col("qe").as("embedding")),
        cents)
      .where(col("arn") <= nProbes)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("centroid_id").cast(cellType).as("cell"))
    val cellVals = probes.select("cell").distinct().collect().map(_.get(0))
    val vecs = raw.where(col("cell").isin(cellVals.toIndexedSeq: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce2"), col("cell"))
    Similarity.cellTopK(probes, vecs, k, raw)
  }

  /** The pruned candidate scan for a probe-cell set — exposed for the
    * plan gate (asserts `cell IN (…)` lands in PartitionFilters). */
  def prunedVectors(spark: SparkSession, root: String,
      cells: Seq[Any]): DataFrame =
    spark.read.parquet(vectorsPath(root))
      .where(col("cell").isin(cells: _*))

  /** Incremental maintenance between rebuilds: assign `batch` (vec_id,
    * embedding) against the PERSISTED centroids — no retraining, so
    * existing cells stay valid — and rewrite ONLY the touched cell
    * partitions, replacing same-id rows (id-keyed upsert, the
    * [[graft.store.VectorStore]] merge discipline at index level).
    *
    * Scale posture: the batch's cells bound the rewrite — untouched
    * partitions are never read or written (dynamic partition
    * overwrite); the kept-rows read is partition-pruned to the touched
    * cells. Centroid drift is the rebuild trigger, not this path's
    * job: a corpus that shifts distribution re-runs [[build]] (the
    * FAISS retrain-vs-add split). Durability here is per-partition
    * (dynamic overwrite is not a single atomic commit) — an
    * interrupted upsert re-applies cleanly because the write is
    * id-keyed and deterministic, the [[graft.streaming.StateCommit]]
    * replay-convergence stance. */
  /** Small-file compaction: every [[upsert]]/[[delete]] rewrite leaves
    * one task's worth of files per touched cell, so a long-lived index
    * accumulates small files — the classic object-store operational
    * tax (listing cost, task-per-file scheduling, row-group overhead).
    * Compact rewrites each cell whose file count exceeds
    * `maxFilesPerCell` into ONE file (a cell is one coarse quantizer
    * region — single-file is the right target until a cell outgrows a
    * task, which is the signal to re-train with more cells).
    * Content-neutral by construction (same rows, new layout);
    * untouched cells are never read. */
  def compact(spark: SparkSession, root: String,
      maxFilesPerCell: Int = 1): Unit = {
    val base = new org.apache.hadoop.fs.Path(vectorsPath(root))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val crowded = fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .filter { st =>
        fs.listStatus(st.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) >
          maxFilesPerCell
      }
      .map(_.getPath.getName.stripPrefix("cell="))
    if (crowded.isEmpty) return
    val raw = spark.read.parquet(vectorsPath(root))
    // type the pruning literals to the read partition-column type so the
    // IN list prunes partitions (a string-vs-int comparison would not)
    val vals: Seq[Any] = raw.schema("cell").dataType match {
      case org.apache.spark.sql.types.LongType => crowded.map(_.toLong)
      case org.apache.spark.sql.types.IntegerType => crowded.map(_.toInt)
      case _ => crowded
    }
    val rewritten = raw
      .where(col("cell").isin(vals: _*))
      .repartition(col("cell")) // one task -> one file per cell
      .localCheckpoint()        // materialize before overwriting its input
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.write.mode("overwrite").partitionBy("cell")
      .parquet(vectorsPath(root))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Delete by id — the index-side mirror of the vector store's K4:
    * locate the victims' cells with one id semi-join (ids are not the
    * partition key, so this pass scans the id column of all cells —
    * a metadata-sized read), then rewrite ONLY those cells without the
    * victim rows. Ids absent from the index are no-ops; replays
    * converge. */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Unit = {
    val raw = spark.read.parquet(vectorsPath(root))
    val victims = ids.select(col("vec_id"))
    val touched = raw.join(victims, Seq("vec_id"), "left_semi")
      .select("cell").distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val kept = raw.where(col("cell").isin(touched.toIndexedSeq: _*))
      .join(victims, Seq("vec_id"), "left_anti")
      .localCheckpoint() // materialize before overwriting its own input
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.write.mode("overwrite").partitionBy("cell")
      .parquet(vectorsPath(root))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // a fully-emptied cell produces no output partition, so dynamic
    // overwrite leaves its old directory (victims included) in place —
    // drop those directories explicitly
    val keptCells = kept.select("cell").distinct().collect().map(_.get(0)).toSet
    val emptied = touched.filterNot(keptCells)
    if (emptied.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val base = new org.apache.hadoop.fs.Path(vectorsPath(root))
      val fs = base.getFileSystem(conf)
      emptied.foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(base, s"cell=$c"), true)
      }
    }
  }

  def upsert(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    val cents = spark.read.parquet(centroidsPath(root))
    val raw = spark.read.parquet(vectorsPath(root))
    val cellType = raw.schema("cell").dataType
    val incoming = Similarity.assignCells(batch, cents)
      .withColumn("cell", col("cell").cast(cellType))
      .localCheckpoint() // the touched-cell collect and the write below
                         // must not re-run the caller's plan twice
    val touched = incoming.select("cell").distinct().collect().map(_.get(0))
    val kept = raw.where(col("cell").isin(touched.toIndexedSeq: _*))
      .join(incoming.select("vec_id"), Seq("vec_id"), "left_anti")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try kept.unionByName(incoming)
      // materialize before overwriting the partitions the plan reads
      .localCheckpoint()
      .write.mode("overwrite").partitionBy("cell").parquet(vectorsPath(root))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
