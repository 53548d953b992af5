package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StateCommit

/** Persisted inverted (lexical) index with BM25 ranking — the
  * build-once / query-many LEXICAL complement to the ANN family
  * ([[AnnIndex]]/[[AnnIndexPq]] answer "semantically near", this
  * answers "contains these terms", and [[LexIndex.hybrid]] fuses the
  * two): postings carry (token, doc_id, tf, dl) — document length is
  * denormalized INTO the posting row, the classic payload trick, so
  * scoring never joins a doc-length table at query time — plus
  * metadata-sized document-frequency and corpus-stat tables, published
  * atomically as one [[StateCommit]] snapshot.
  *
  * Query cost is the inverted-index contract: ONLY the query terms'
  * posting rows are read (`token IN (...)` pushes to the parquet
  * scan), never the corpus. Postings are written repartitioned by
  * token; at cluster scale the same layout becomes a token-bucketed
  * table ([[Bucketing]]) or a token-prefix-partitioned directory so
  * the IN-filter prunes at the file level, the [[AnnIndex]] cell
  * discipline applied to text.
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

  private def writeSnapshot(spark: SparkSession, root: String, v: Long,
      postings: DataFrame, dfs: DataFrame, stats: DataFrame,
      gens: Seq[Long], nBuckets: Int): Long = {
    postings.repartition(nBuckets, col("token"))
      .write.mode("overwrite").parquet(genDir(root, v))
    dfs.coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Dfs))
    stats.coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Stats))
    val s = spark
    import s.implicits._
    gens.toDF("gen").coalesce(1)
      .write.mode("overwrite").parquet(StateCommit.tableDir(root, v, Manifest))
    StateCommit.commit(spark, root, v)
    v
  }

  /** Build (or rebuild from scratch) the index; returns the committed
    * snapshot version. One corpus scan: tf, dl, df and the corpus
    * stats all derive from the same token aggregation. */
  def build(spark: SparkSession, documents: DataFrame, root: String,
      nBuckets: Int = 32): Long = {
    val v = StateCommit.currentVersion(spark, root).getOrElse(0L) + 1
    val (postings, dfs, stats) = batchParts(documents)
    writeSnapshot(spark, root, v, postings, dfs, stats, Seq(v), nBuckets)
  }

  /** Fold a batch of NEW documents into the index WITHOUT rescanning
    * the corpus: the batch's postings land as an immutable generation,
    * and the df / corpus-stat tables merge algebraically (df and
    * doc-count/token-total sums are EXACTLY additive over disjoint doc
    * sets), so a search over the ingested index is row-for-row equal
    * to one over a from-scratch rebuild — spec-pinned, and the
    * lx_search_inc driver gate proves it against the full-corpus
    * oracle. Contract: batches are append-only NEW doc_ids (the
    * [[IncrementalAgg]] discipline); re-ingesting a doc double-counts
    * — route update/delete workloads through [[DedupIndex]]-style
    * tombstones or a rebuild. */
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
    writeSnapshot(spark, root, v, postings, mergedDfs, mergedStats, gens, nBuckets)
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
    val gens = spark.read.parquet(StateCommit.tableDir(root, prev, Manifest))
      .collect().map(_.getLong(0)).toSeq
    val postings = spark.read.parquet(gens.map(g => genDir(root, g)): _*)
    val dfs = spark.read.parquet(StateCommit.tableDir(root, prev, Dfs))
    val stats = spark.read.parquet(StateCommit.tableDir(root, prev, Stats))
    writeSnapshot(spark, root, v, postings, dfs, stats, Seq(v), nBuckets)
  }

  /** BM25 top-k for a bag of query terms: (doc_id, score_micro, rank).
    * Score is the exact BIGINT sum of per-term micro-scores; rank
    * breaks ties by doc_id. Terms not in the index contribute nothing;
    * an empty term list returns no rows. */
  def search(spark: SparkSession, root: String, terms: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val v = StateCommit.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed lexical index at $root"))
    if (terms.isEmpty)
      return spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("score_micro"),
          lit(0).as("rank")).limit(0)
    val stats = spark.read.parquet(StateCommit.tableDir(root, v, Stats))
    val dfs = spark.read.parquet(StateCommit.tableDir(root, v, Dfs))
      .where(col("token").isin(terms: _*))
    // the manifest's generation list is metadata-sized (one entry per
    // ingest since the last rebuild)
    val gens = spark.read.parquet(StateCommit.tableDir(root, v, Manifest))
      .collect().map(_.getLong(0)).toSeq
    val postings = spark.read
      .parquet(gens.map(g => genDir(root, g)): _*)
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
