package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.LocalHashEmbedder
import graft.model.Selection
import graft.store.{ParquetVectorStore, VectorStoreWriter}
import graft.sync.SyncEngine

/** Write-failure isolation (reference batch-failure semantics,
  * `class-indexer.php:438-443`): a store failure marks this run's rows
  * status='error' (with code + truncated message) instead of killing the
  * job, and the NEXT pass with a healthy store re-processes exactly those
  * products (T8 self-heal) — the product_sha short-circuit must not skip
  * errored rows.
  */
class ErrorIsolationSpec extends SparkSpec {

  import spark.implicits._

  /** Delegates to a real store but fails upserts while `failing` is true. */
  private final class FlakyStore(inner: ParquetVectorStore)
      extends VectorStoreWriter with Serializable {
    var failing = true
    override def upsert(p: DataFrame): Int =
      if (failing) throw new RuntimeException("HTTP 503 from vector store")
      else inner.upsert(p)
    override def deleteByIds(ids: DataFrame): Int = inner.deleteByIds(ids)
    override def deleteByProduct(p: Long, s: Int): Int = inner.deleteByProduct(p, s)
    override def purgeSite(s: Int): Int = inner.purgeSite(s)
    override def read(): DataFrame = inner.read()
    override def count(): Long = inner.count()
    override def currentVersion: Int = inner.currentVersion
  }

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").limit(10)
      .select(col("doc_id").as("product_id"), lit(1).as("site_id"),
        concat(lit("DOC-"), col("doc_id")).as("sku"), col("text"))

  test("store failure -> rows error'd, job survives; next pass self-heals") {
    val dir = Files.createTempDirectory("graft-flaky")
    val inner = new ParquetVectorStore(spark, dir.resolve("store").toString)
    val store = new FlakyStore(inner)
    val engine = new SyncEngine(spark, new LocalHashEmbedder(), store,
      dir.resolve("sync").toString, Selection(chunkSize = 25, chunkOverlap = 0))

    // pass 1: upsert fails — no store rows, sync_state rows all error
    engine.sync(docs)
    assert(inner.count() == 0)
    val st1 = engine.readSyncState()
    assert(st1.where(col("status") === "error").count() == st1.count() && st1.count() > 0)
    val err = st1.select("error_code", "error_msg").head()
    assert(err.getString(0) == "graft_store_error")
    assert(err.getString(1).contains("503"))

    // pass 2 (store healthy): errored products bypass the sha
    // short-circuit, re-embed, and land synced
    store.failing = false
    val summary2 = engine.sync(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary2.getOrElse("skip_unchanged", 0L) == 0L)
    assert(summary2.getOrElse("upsert", 0L) == st1.count())
    val st2 = engine.readSyncState()
    assert(st2.where(col("status") === "synced").count() == st2.count())
    assert(inner.count() == st2.count())

    // pass 3: now fully unchanged — zero writes, pure touch
    val v = inner.currentVersion
    val summary3 = engine.sync(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary3.getOrElse("skip_unchanged", 0L) == 10L)
    assert(inner.currentVersion == v)
  }
}
