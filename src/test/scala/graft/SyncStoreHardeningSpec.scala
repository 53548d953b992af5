package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.LocalHashEmbedder
import graft.events.EventLog
import graft.model.Selection
import graft.scan.{EventFilters, Scans, Watermark}
import graft.store.{EnsureStoreVectorStore, ParquetVectorStore, VectorStoreWriter}
import graft.sync.SyncEngine

/** Round-11 sync/store engine hardening (review sweep #3). Each test pins
  * one failure mode found by reading the engine against its own T7/T8
  * idempotence + self-heal contract:
  *
  *   1. a failed store write must NOT drop the delete-routed sync_state
  *      rows — they are the only record from which the self-heal pass can
  *      re-derive the delete set (stale vectors orphaned forever otherwise);
  *   2. deleteProduct's bookkeeping purge is (product_id, site_id, target)
  *      scoped, matching the store delete's filter;
  *   3. the per-pass sync event attributes the batch's OWN site;
  *   4. Scans.eventLogRead accepts EventLog.read rows (no event_id /
  *      duration_ms columns) as its own doc promises;
  *   5. an un-appended EventLog reads as empty, not PATH_NOT_FOUND;
  *   6. retention survives a malformed log_date partition dir;
  *   7. EnsureStoreVectorStore works after Java serialization (@transient
  *      Option deserializes to null);
  *   8. a single upsert batch with duplicate ids commits ONE row per id.
  */
class SyncStoreHardeningSpec extends SparkSpec {

  import spark.implicits._

  /** Delegates to a real store but fails deletes while `failing` is true. */
  private final class FlakyDeleteStore(inner: ParquetVectorStore)
      extends VectorStoreWriter with Serializable {
    var failing = true
    override def upsert(p: DataFrame): Int = inner.upsert(p)
    override def deleteByIds(ids: DataFrame): Int =
      if (failing) throw new RuntimeException("HTTP 503 from vector store")
      else inner.deleteByIds(ids)
    override def deleteByProduct(p: Long, s: Int): Int = inner.deleteByProduct(p, s)
    override def purgeSite(s: Int): Int = inner.purgeSite(s)
    override def read(): DataFrame = inner.read()
    override def count(): Long = inner.count()
    override def currentVersion: Int = inner.currentVersion
  }

  private def candidates(text: String): DataFrame =
    Seq((1L, 1, "SKU-1", text))
      .toDF("product_id", "site_id", "sku", "text")

  test("failed delete keeps the delete set in sync_state; self-heal clears the stale vectors") {
    val dir = Files.createTempDirectory("graft-flakydel")
    val inner = new ParquetVectorStore(spark, dir.resolve("store").toString)
    val store = new FlakyDeleteStore(inner)
    store.failing = false
    val engine = new SyncEngine(spark, new LocalHashEmbedder(), store,
      dir.resolve("sync").toString, Selection(chunkSize = 25, chunkOverlap = 0))

    // pass 1 (healthy): long text chunks at 25 bytes → several chunks land
    engine.sync(candidates("lorem ipsum dolor sit amet " * 4))
    val n1 = inner.count()
    assert(n1 > 1)

    // pass 2: text shrinks to 1 chunk, but the delete fails — the
    // delete-routed rows must SURVIVE as error rows, not vanish
    store.failing = true
    engine.sync(candidates("short text"))
    val st = engine.readSyncState()
    assert(st.count() == n1) // 1 fresh + (n1-1) preserved delete-routed
    assert(st.where(col("status") === "error").count() == n1)
    assert(inner.count() == n1) // stale vectors still present (delete failed)

    // pass 3 (healthy): self-heal re-derives the delete set from the
    // preserved rows; the store converges to exactly the 1 live chunk
    store.failing = false
    engine.sync(candidates("short text"))
    assert(inner.count() == 1)
    assert(inner.read().select("id").as[String].collect().toSeq ==
      Seq("site-1:product-1:chunk-0"))
    val healed = engine.readSyncState()
    assert(healed.count() == 1 &&
      healed.where(col("status") === "synced").count() == 1)
  }

  test("deleteProduct purges bookkeeping only for the matching site") {
    val dir = Files.createTempDirectory("graft-sitedel")
    val store = new ParquetVectorStore(spark, dir.resolve("store").toString)
    val engine = new SyncEngine(spark, new LocalHashEmbedder(), store,
      dir.resolve("sync").toString, Selection(chunkSize = 25, chunkOverlap = 0))
    engine.sync(Seq((42L, 7, "SKU-42", "some text for site seven"))
      .toDF("product_id", "site_id", "sku", "text"))
    assert(store.count() > 0)

    // wrong site: store deletes nothing, and the bookkeeping must match
    assert(engine.deleteProduct(42L, siteId = 1) == 0L)
    assert(engine.readSyncState().count() > 0)
    assert(store.count() > 0)

    // right site: both sides clear
    assert(engine.deleteProduct(42L, siteId = 7) > 0L)
    assert(engine.readSyncState().count() == 0)
    assert(store.count() == 0)
  }

  test("sync event row carries the batch's own site; multi-site batch logs NULL") {
    val dir = Files.createTempDirectory("graft-eventsite")
    val store = new ParquetVectorStore(spark, dir.resolve("store").toString)
    val log = new EventLog(spark, dir.resolve("events").toString)
    val engine = new SyncEngine(spark, new LocalHashEmbedder(), store,
      dir.resolve("sync").toString, Selection(chunkSize = 25, chunkOverlap = 0),
      events = Some(log))
    engine.sync(Seq((1L, 7, "A", "first text")).toDF("product_id", "site_id", "sku", "text"))
    engine.sync(Seq((2L, 3, "B", "second text"), (3L, 5, "C", "third text"))
      .toDF("product_id", "site_id", "sku", "text"))
    val rows = log.read().where(col("action") === "sync")
      .select("site_id").collect().map(r => Option(r.get(0)).map(_.toString))
    assert(rows.toSet == Set(Some("7"), None))
  }

  test("eventLogRead accepts the engine's own EventLog rows") {
    val dir = Files.createTempDirectory("graft-elr")
    val store = new ParquetVectorStore(spark, dir.resolve("store").toString)
    val log = new EventLog(spark, dir.resolve("events").toString)
    val engine = new SyncEngine(spark, new LocalHashEmbedder(), store,
      dir.resolve("sync").toString, Selection(chunkSize = 25, chunkOverlap = 0),
      events = Some(log))
    engine.sync(candidates("event pairing text"))
    val out = Scans.eventLogRead(log.read(),
      EventFilters(action = Some("sync")), limit = 10)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(out.columns.indexOf("event_id")))
    assert(rows(0).isNullAt(out.columns.indexOf("duration_ms")))
    assert(rows(0).getString(out.columns.indexOf("action")) == "sync")
  }

  test("un-appended event log reads empty and exports an empty csv") {
    val dir = Files.createTempDirectory("graft-emptylog")
    val log = new EventLog(spark, dir.resolve("never-written").toString)
    assert(log.read().count() == 0)
    log.exportCsv(dir.resolve("out.csv").toString) // must not throw
  }

  test("prune skips a malformed log_date partition dir but still prunes real ones") {
    val dir = Files.createTempDirectory("graft-badpart")
    val root = dir.resolve("events")
    val log = new EventLog(spark, root.toString)
    log.append(Seq(("2024-01-01 00:00:00", 1L)).toDF("ts_s", "product_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s"))
    Files.createDirectories(root.resolve("log_date=__HIVE_DEFAULT_PARTITION__"))
    val dropped = log.prune(java.time.LocalDate.parse("2024-12-01"), retainDays = 30)
    assert(dropped == Seq("log_date=20240101"))
    assert(Files.exists(root.resolve("log_date=__HIVE_DEFAULT_PARTITION__")))
  }

  test("EnsureStoreVectorStore survives a serialization round-trip") {
    val dir = Files.createTempDirectory("graft-ser")
    val store = new EnsureStoreVectorStore(spark, dir.resolve("s").toString)
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(store); oos.close()
    val copy = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[EnsureStoreVectorStore]
    // the @transient Option field is null after deserialization — the
    // guard must lazily re-ensure instead of NPE-ing
    assert(copy.ensureStore().startsWith("vs_"))
    assert(copy.ensureStore() == store.ensureStore())
  }

  test("upsert collapses duplicate ids within one batch to a single row") {
    val dir = Files.createTempDirectory("graft-dupup")
    val store = new ParquetVectorStore(spark, dir.resolve("store").toString)
    def payload(id: String, sku: String) =
      (id, Seq(1.0f), 1, 1L, sku, "u", "t", "fp", Seq("name"))
    store.upsert(Seq(payload("site-1:product-1:chunk-0", "OLD"),
        payload("site-1:product-1:chunk-0", "ZNEW"))
      .toDF("id", "values", "site_id", "product_id", "sku", "url",
        "updated_at", "fingerprint", "fields"))
    val rows = store.read().collect()
    assert(rows.length == 1)
    // deterministic winner (max struct over the non-id columns)
    assert(rows(0).getAs[String]("sku") == "ZNEW")
  }
}
