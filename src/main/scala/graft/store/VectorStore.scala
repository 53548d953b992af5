package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The adapter contract (reference
  * `includes/adapters/class-adapter-interface.php:24-34`, injected per
  * sync via the `wcvec_adapters_for_sync` filter — here plain constructor
  * injection, SURVEY §2.12). */
trait VectorStoreWriter {
  def upsert(payloads: DataFrame): Int
  def deleteByIds(ids: DataFrame): Int
  def deleteByProduct(productId: Long, siteId: Int): Int
  def purgeSite(siteId: Int): Int
  def read(): DataFrame
  def count(): Long
  def currentVersion: Int
}

/** Vector-store sink with Pinecone-equivalent semantics on immutable
  * storage (SURVEY §2.2 K1–K5, §7.5.3): id-keyed upsert, delete-by-ids,
  * delete-by-metadata-filter, purge-site — each a deterministic
  * merge-rewrite, so every operation is idempotent (T7) and re-running
  * converges.
  *
  * Store schema: (id string, values array<float>, site_id int,
  * product_id bigint, sku string, url string, updated_at string,
  * fingerprint string, fields array<string>) — the flattened payload of
  * reference `includes/class-indexer.php:101-116`.
  *
  * Snapshots are BUCKETED by `product_id % nBuckets` (round 1 rewrote the
  * whole store every commit — a full copy per sync pass at 100 TB). A
  * `_MANIFEST` cursor maps bucket → the commit whose files currently hold
  * it; a commit writes ONLY the touched buckets under `c{N}/bucket=K/` and
  * re-points just those manifest entries, so untouched buckets' files are
  * never rewritten (asserted byte-identical by BucketedStoreSpec). All of
  * a product's chunk vectors share a bucket, so the per-product delete and
  * the sync delta's upserts each touch exactly the buckets they name.
  *
  * `siteBuckets = true` extends the bucket key to
  * `site_id * nBuckets + product_id % nBuckets` — every bucket then holds
  * ONE site's rows, so `purgeSite` prunes to that site's buckets instead
  * of sweeping the store (the multi-tenant deployment shape at 100 TB;
  * requires `site_id >= 0`). The manifest header records the mode, so
  * opening a store in the wrong mode fails loudly instead of mis-routing
  * rows.
  */
final class ParquetVectorStore(spark: SparkSession, root: String,
    nBuckets: Int = 16, siteBuckets: Boolean = false)
    extends VectorStoreWriter with Serializable {

  // def, not val: java.nio.file.Path is NOT Serializable, and a Path
  // field would break this class's Serializable contract the moment a
  // closure or a decorating adapter captures it
  private def fs = java.nio.file.Paths.get(root)

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("values", ArrayType(FloatType), nullable = false),
    StructField("site_id", IntegerType, nullable = false),
    StructField("product_id", LongType, nullable = false),
    StructField("sku", StringType),
    StructField("url", StringType),
    StructField("updated_at", StringType),
    StructField("fingerprint", StringType),
    StructField("fields", ArrayType(StringType))))

  private def manifestFile = fs.resolve("_MANIFEST")

  /** (commit counter, bucket → commit holding its current files). The
    * manifest header pins the store's bucket count — opening with a
    * different `nBuckets` would route rows to the wrong buckets and
    * silently lose them, so it fails loudly instead. A legacy
    * `_VERSION`-layout store (pre-bucketing) likewise fails loudly
    * rather than reading as empty. */
  private def readManifest(): (Int, Map[Int, Int]) =
    if (!java.nio.file.Files.exists(manifestFile)) {
      if (java.nio.file.Files.exists(fs.resolve("_VERSION")))
        throw new IllegalStateException(
          s"$root uses the legacy _VERSION store layout; re-sync into a " +
            "fresh store dir (bucketed _MANIFEST layout)")
      (0, Map.empty)
    } else {
      val lines = new String(java.nio.file.Files.readAllBytes(manifestFile))
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toList
      val header = lines.head.split(" ")
      if (header.length > 1 && header(1).toInt != nBuckets)
        throw new IllegalStateException(
          s"$root was written with nBuckets=${header(1)}, opened with $nBuckets")
      val wroteSite = header.length > 2 && header(2) == "site"
      if (header.length > 1 && wroteSite != siteBuckets)
        throw new IllegalStateException(
          s"$root was written with siteBuckets=$wroteSite, opened with $siteBuckets")
      val entries = lines.tail.map { l =>
        val Array(b, c) = l.split(" "); b.toInt -> c.toInt
      }.toMap
      (header(0).toInt, entries)
    }

  private def writeManifest(commit: Int, m: Map[Int, Int]): Unit = {
    java.nio.file.Files.createDirectories(fs)
    val mode = if (siteBuckets) " site" else ""
    val body = (s"$commit $nBuckets$mode" +: m.toSeq.sorted.map { case (b, c) => s"$b $c" })
      .mkString("", "\n", "\n")
    // temp + atomic move: a partial write must never leave a corrupt cursor
    val tmp = fs.resolve("_MANIFEST.tmp")
    java.nio.file.Files.write(tmp, body.getBytes)
    java.nio.file.Files.move(tmp, manifestFile,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def currentVersion: Int = readManifest()._1

  private def emptyDf: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def bucketPath(b: Int, c: Int) = fs.resolve(s"c$c/bucket=$b").toString

  /** Rows of the given buckets at their manifest commits (no bucket col —
    * it's derivable from product_id). */
  private def readBuckets(m: Map[Int, Int], buckets: Seq[Int]): DataFrame = {
    val paths = buckets.distinct.flatMap(b => m.get(b).map(c => bucketPath(b, c)))
    if (paths.isEmpty) emptyDf else spark.read.schema(schema).parquet(paths: _*)
  }

  def read(): DataFrame = {
    val (_, m) = readManifest()
    readBuckets(m, m.keys.toSeq)
  }

  /** Bucket from the payload's (site_id,) product_id (modulo: synthetic
    * ids are uniform; an id-clustered deployment would swap in a stable
    * hash). Site-aware mode gives each site its own bucket range — and
    * FAILS LOUDLY on a NULL or negative site_id: such a row would land in
    * a bucket that deleteByProduct/purgeSite's integer routing
    * (`siteId * nBuckets`, `bucket / nBuckets == siteId`) can never
    * address, i.e. written but silently unreachable by the pruned delete
    * paths (the same fail-fast discipline as the manifest mode check). */
  private def bucketCol = {
    val pidPart = pmod(col("product_id"), lit(nBuckets.toLong))
    (if (siteBuckets) {
      val site = when(col("site_id").isNull || col("site_id") < 0,
        raise_error(concat(
          lit("siteBuckets mode requires site_id >= 0; got "),
          coalesce(col("site_id").cast("string"), lit("NULL")),
          lit(" for product_id "), col("product_id").cast("string"))))
        .otherwise(col("site_id").cast("long"))
      site * nBuckets + pidPart
    } else pidPart).cast("int")
  }

  /** Bucket recovered from the deterministic vector-id format
    * `site-%d:product-%d:chunk-%d` (reference `class-indexer.php:147-150`)
    * so delete-by-ids routes to buckets without a store scan. An id that
    * doesn't match the format maps to bucket −1 (no manifest entry →
    * the delete is a no-op for it, matching the pre-bucketed anti-join
    * behavior instead of crashing on a null bucket). */
  private def bucketOfId = {
    // try_cast: a non-matching id extracts "" and ANSI cast would throw
    val pidPart =
      pmod(expr("try_cast(regexp_extract(id, 'product-(\\\\d+):', 1) AS BIGINT)"),
        lit(nBuckets.toLong))
    val sitePart =
      expr("try_cast(regexp_extract(id, 'site-(\\\\d+):', 1) AS BIGINT)")
    coalesce(
      (if (siteBuckets) sitePart * nBuckets + pidPart else pidPart).cast("int"),
      lit(-1))
  }

  /** Write `df` (restricted to `touched` buckets, carrying a `bucket`
    * column) as commit N, re-pointing only the touched manifest entries.
    * A bucket whose rows all vanished drops out of the manifest. */
  private def commitBuckets(touched: Seq[Int], df: DataFrame): Int = {
    val (commit, m) = readManifest()
    val next = commit + 1
    val dir = fs.resolve(s"c$next")
    df.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(dir.toString)
    val present = touched.distinct
      .filter(b => java.nio.file.Files.exists(dir.resolve(s"bucket=$b"))).toSet
    val m2 = (m -- touched.filterNot(present)) ++ present.map(_ -> next)
    writeManifest(next, m2)
    next
  }

  /** K1/K2 — id-keyed upsert: incoming rows replace same-id rows; only
    * the incoming rows' buckets are read and rewritten. A batch carrying
    * the same id twice collapses to ONE row first ([[graft.operators
    * .CdcBatch]]) — Pinecone's id-keyed upsert is single-winner within a
    * batch, and without the collapse both rows land and read() returns
    * duplicate ids until a later upsert replaces them. */
  def upsert(payloads: DataFrame): Int = {
    // cache: the touched-bucket collect() and the commit write would
    // otherwise each evaluate the caller's (possibly expensive) plan
    val incoming = graft.operators.CdcBatch.collapse(
        payloads.select(schema.fieldNames.toIndexedSeq.map(col): _*), "id")
      .withColumn("bucket", bucketCol)
      .cache()
    try {
      val touched = incoming.select("bucket").distinct()
        .collect().map(_.getInt(0)).toIndexedSeq
      val (_, m) = readManifest()
      val kept = readBuckets(m, touched).withColumn("bucket", bucketCol)
        .join(incoming.select("id"), Seq("id"), "left_anti")
      commitBuckets(touched, kept.unionByName(incoming))
    } finally incoming.unpersist()
  }

  /** K4 — delete by ids, routed to buckets via the id format. */
  def deleteByIds(ids: DataFrame): Int = {
    val keyed = ids.select("id").withColumn("bucket", bucketOfId).cache()
    try {
      val touched = keyed.select("bucket").distinct()
        .collect().map(_.getInt(0)).filter(_ >= 0).toIndexedSeq
      val (_, m) = readManifest()
      val kept = readBuckets(m, touched).withColumn("bucket", bucketCol)
        .join(keyed.select("id"), Seq("id"), "left_anti")
      commitBuckets(touched, kept)
    } finally keyed.unpersist()
  }

  /** K3 — delete by metadata filter {product_id, site_id} (the Pinecone
    * `$eq` filter form); exactly one bucket rewritten. */
  def deleteByProduct(productId: Long, siteId: Int): Int = {
    val pidPart = ((productId % nBuckets + nBuckets) % nBuckets).toInt
    val b = if (siteBuckets) siteId * nBuckets + pidPart else pidPart
    val (_, m) = readManifest()
    val kept = readBuckets(m, Seq(b)).withColumn("bucket", bucketCol)
      .where(!(col("product_id") === productId && col("site_id") === siteId))
    commitBuckets(Seq(b), kept)
  }

  /** K5 — purge site. Default layout sweeps every bucket (sites span
    * products); `siteBuckets` prunes the rewrite to the target site's own
    * bucket range — the whole point of the site-partitioned layout. */
  def purgeSite(siteId: Int): Int = {
    val (_, m) = readManifest()
    val touched =
      if (siteBuckets) m.keys.filter(_ / nBuckets == siteId).toIndexedSeq
      else m.keys.toIndexedSeq
    val kept = readBuckets(m, touched).withColumn("bucket", bucketCol)
      .where(col("site_id") =!= siteId)
    commitBuckets(touched, kept)
  }

  def count(): Long = read().count()
}
