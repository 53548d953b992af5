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
  * delete-by-metadata-filter, purge-site — each implemented as a
  * deterministic merge-rewrite producing a new snapshot version, so every
  * operation is idempotent (T7) and re-running converges.
  *
  * Store schema: (id string, values array<float>, site_id int,
  * product_id bigint, sku string, url string, updated_at string,
  * fingerprint string, fields array<string>) — the flattened payload of
  * reference `includes/class-indexer.php:101-116` /
  * `includes/adapters/class-adapter-interface.php:24-34`.
  *
  * Scale posture: upsert is one left-anti join (old ∖ incoming-ids) + union
  * — a single shuffle keyed on `id`; deletes are shuffle-free filters. A
  * real deployment would partition snapshots by `site_id` and bucket by
  * `product_id` so per-product deletes prune partitions; at test scale we
  * keep one dir per version with a `_VERSION` cursor file.
  */
final class ParquetVectorStore(spark: SparkSession, root: String)
    extends VectorStoreWriter with Serializable {

  private val fs = java.nio.file.Paths.get(root)

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

  private def versionFile = fs.resolve("_VERSION")

  def currentVersion: Int =
    if (java.nio.file.Files.exists(versionFile))
      new String(java.nio.file.Files.readAllBytes(versionFile)).trim.toInt
    else 0

  def read(): DataFrame = {
    val v = currentVersion
    if (v == 0) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(fs.resolve(s"v$v").toString)
  }

  private def commit(df: DataFrame): Int = {
    val next = currentVersion + 1
    df.write.mode(SaveMode.Overwrite).parquet(fs.resolve(s"v$next").toString)
    java.nio.file.Files.createDirectories(fs)
    // temp + atomic move: a partial write must never leave a corrupt cursor
    val tmp = fs.resolve("_VERSION.tmp")
    java.nio.file.Files.write(tmp, next.toString.getBytes)
    java.nio.file.Files.move(tmp, versionFile,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** K1/K2 — id-keyed upsert: incoming rows replace same-id rows. */
  def upsert(payloads: DataFrame): Int = {
    val incoming = payloads.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    val kept = read().join(incoming.select("id"), Seq("id"), "left_anti")
    commit(kept.unionByName(incoming))
  }

  /** K4 — delete by ids. */
  def deleteByIds(ids: DataFrame): Int =
    commit(read().join(ids.select("id"), Seq("id"), "left_anti"))

  /** K3 — delete by metadata filter {product_id, site_id}
    * (the Pinecone `$eq` filter form). */
  def deleteByProduct(productId: Long, siteId: Int): Int =
    commit(read().where(!(col("product_id") === productId &&
      col("site_id") === siteId)))

  /** K5 — purge site. */
  def purgeSite(siteId: Int): Int =
    commit(read().where(col("site_id") =!= siteId))

  def count(): Long = read().count()
}
