package graft.scan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Candidate scans + scheduler set-ops (SURVEY §2.1 S1–S3, §2.6 D1–D2).
  *
  * Scale posture: each scan is a filter/aggregate over the `sync_state`
  * table joined to `products`. At 100 TB both sides are large, so the joins
  * are plain shuffled equi-joins on `product_id` — Spark picks sort-merge +
  * AQE; no row ever leaves the executors except the final `limit`, which is
  * a `TakeOrderedAndProject` (no full sort materialized on the driver).
  */
object Scans {

  /** Status-scope predicate P5 (reference `includes/class-storage.php:343-351`). */
  def statusScope(includeDraftsPrivate: Boolean) =
    if (includeDraftsPrivate)
      col("post_status").isin("publish", "draft", "private")
    else col("post_status") === "publish"

  /** S1 — initial-sync candidate scan: products with NO sync-state rows
    * (`NOT EXISTS` anti-join), newest-modified first, capped.
    * Reference `includes/class-storage.php:223-243`. */
  def initialScan(products: DataFrame, syncState: DataFrame, limit: Int,
      includeDraftsPrivate: Boolean = false): DataFrame =
    products
      .where(statusScope(includeDraftsPrivate))
      .join(syncState.select("product_id").distinct(), Seq("product_id"), "left_anti")
      .orderBy(col("post_modified_gmt").desc, col("product_id").desc)
      .limit(limit)
      .select(col("product_id"),
        date_format(col("post_modified_gmt"), "yyyy-MM-dd HH:mm:ss").as("modified"))

  /** S2 — modified-since scan: products whose `post_modified_gmt >= since`
    * and whose last sync (MAX(GREATEST(updated_at, last_synced_at)) per
    * product) is missing or older than the modification.
    * Reference `includes/class-storage.php:254-281` (the incremental
    * watermark scan). The aggregate runs BEFORE the join so the join's
    * build side is one row per product, not per chunk. */
  def modifiedScan(products: DataFrame, syncState: DataFrame, since: String,
      limit: Int, includeDraftsPrivate: Boolean = false): DataFrame = {
    val lastSync = syncState.groupBy("product_id")
      .agg(max(greatest(col("updated_at"), col("last_synced_at"))).as("last_sync"))
    products
      .where(statusScope(includeDraftsPrivate))
      .join(lastSync, Seq("product_id"), "left_outer")
      .where(col("post_modified_gmt") >= lit(since).cast("timestamp") &&
        (col("last_sync").isNull || col("last_sync") < col("post_modified_gmt")))
      .orderBy(col("post_modified_gmt").desc, col("product_id").desc)
      .limit(limit)
      .select(col("product_id"),
        date_format(col("post_modified_gmt"), "yyyy-MM-dd HH:mm:ss").as("modified"))
  }

  /** S3 — error scan: DISTINCT errored product ids, id-descending, capped.
    * Reference `includes/class-storage.php:300-308`. */
  def errorScan(syncState: DataFrame, limit: Int): DataFrame =
    syncState.where(col("status") === "error")
      .select("product_id").distinct()
      .orderBy(col("product_id").desc)
      .limit(limit)

  /** D1 — priority union of candidate lists: errors(0) ∪ modified(1) ∪
    * initial(2), first-occurrence-wins dedup, capped.
    * Reference `includes/class-scheduler.php:139-158`. */
  def priorityUnion(products: DataFrame, syncState: DataFrame, since: String,
      limit: Int): DataFrame = {
    val err = errorScan(syncState, limit).withColumn("prio", lit(0))
    val mod = modifiedScan(products, syncState, since, limit)
      .select(col("product_id"), lit(1).as("prio"))
    val init = initialScan(products, syncState, limit)
      .select(col("product_id"), lit(2).as("prio"))
    err.unionByName(mod).unionByName(init)
      .groupBy("product_id").agg(min("prio").as("prio"))
      .orderBy(col("prio"), col("product_id"))
      .limit(limit)
  }

  /** S5 — variation children of a set of parents, id-ascending, capped per
    * the rollup scan cap. Reference `includes/class-variation-rollup.php:33-49`. */
  def variationChildren(products: DataFrame, parentFilter: org.apache.spark.sql.Column,
      includeDraftsPrivate: Boolean = false): DataFrame =
    products
      .where(col("post_type") === "product_variation" && parentFilter &&
        statusScope(includeDraftsPrivate))
      .orderBy(col("parent_id"), col("product_id"))

  /** D2 — variation+parent dedup: for variation rows also emit the parent
    * id, order-preserving dedup. Reference `includes/class-storage.php:317-340`. */
  def variationParentDedup(products: DataFrame): DataFrame =
    products.where(col("post_type") === "product_variation")
      .select(explode(array(col("product_id"), col("parent_id"))).as("id"))
      .distinct()
      .orderBy("id")

  /** S6 — 3-stage product search: exact SKU → title contains → fuzzy SKU
    * LIKE, dedup across stages, capped.
    * Reference `admin/pages/class-admin-page-fields.php:131-213`. */
  def productSearch(products: DataFrame, q: String, limit: Int): DataFrame =
    // Single pass: the three stages are evaluated as a first-match-wins
    // CASE, which equals MIN(stage) over stage memberships (stage 1 ⇒
    // CASE=1; stages 2∧3 ⇒ CASE=2; only 3 ⇒ 3) — so the union + groupBy
    // of the reference's loop collapses into one scan + TakeOrdered, no
    // shuffle. At 100 TB this is the difference between 3 scans of the
    // catalog and 1.
    products.select("product_id", "title", "sku")
      .withColumn("stage",
        when(col("sku") === q, 1)
          .when(lower(col("title")).contains(q.toLowerCase), 2)
          .when(col("sku").contains(q), 3))
      .where(col("stage").isNotNull)
      .orderBy(col("stage"), col("product_id"))
      .limit(limit)
      .select("product_id", "title", "sku", "stage")

  /** T1 — lifecycle CDC routing (reference save/status-transition/trash
    * hooks, `includes/class-lifecycle.php:39-67`, with the P6 skips
    * `:118-131`): classify each change row into the job it enqueues —
    *   skip    non-product types, autosaves, revisions
    *   index   transition INTO publish (or a publish-state save)
    *   delete  ANY transition into trash (`on_trashed_post`/
    *           `on_before_delete` fire regardless of prior status — a
    *           trashed DRAFT must still clear its vectors when drafts are
    *           indexed), or a transition OUT of publish (unpublish ≡ purge)
    *   skip    everything else (draft→draft edits etc.)
    * Pure row-local predicate chain — the streaming consumer applies it
    * per micro-batch before fanning out to the sync/delete jobs. */
  def lifecycleRoute(cdc: DataFrame): DataFrame =
    cdc.select(col("product_id"), col("post_type"),
      col("old_status"), col("new_status"),
      when(!col("post_type").isin("product", "product_variation"), "skip")
        .when(col("new_status") === "publish", "index")
        .when(col("new_status") === "trash", "delete")
        .when(col("old_status") === "publish" &&
          col("new_status") =!= "publish", "delete")
        .otherwise("skip").as("action"))
      .orderBy("product_id")

  /** A3 — job/queue metrics: row counts by sync status (the scheduler's
    * backlog estimate, reference `includes/class-scheduler.php:259-327`). */
  def jobMetrics(syncState: DataFrame): DataFrame =
    syncState.groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")

  /** S7 — event-log read with the reference's ACTUAL filter set
    * (`filter_match`, `includes/class-events.php:148-155`): optional
    * equality on product_id / target / action / outcome, newest-first,
    * offset/limit pagination (`read_recent` `:50-94`). The input carries
    * the reference's log-row columns (Catalog.eventLog / EventLog.read).
    * The offset composes with the sort into one TakeOrdered-style pass —
    * no full materialization. */
  def eventLogRead(log: DataFrame, filters: EventFilters, limit: Int,
      offset: Int = 0): DataFrame = {
    // The engine's own EventLog rows carry no event_id / duration_ms —
    // normalize them to typed NULLs so the documented pairing with
    // EventLog.read works instead of dying on an unresolved column
    // (Catalog.eventLog's synthetic table carries both, so it is
    // untouched by this).
    val norm = Seq("event_id" -> "bigint", "duration_ms" -> "bigint")
      .foldLeft(log) { case (d, (c, t)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(t))
      }
    norm.where(filters.predicate)
      .orderBy(col("ts").desc, col("event_id").desc)
      .offset(offset)
      .limit(limit)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("product_id"), col("target"), col("action"), col("outcome"),
        col("duration_ms"))
  }

  /** S8 — semi-structured payload rollup: extract a typed field from a
    * JSON `props` string column and aggregate per event type. The
    * common at-scale shape for event streams whose payload schema is
    * open-ended: `get_json_object` is codegen'd, the parse happens in
    * the scan stage (no UDF, no intermediate struct materialization),
    * and the aggregate is one map-side-combinable shuffle of
    * (event_type, k) rows — the JSON text itself never shuffles. */
  def propsRollup(events: DataFrame): DataFrame = {
    // integer-pattern guard BEFORE the cast: a valid-JSON payload whose
    // k is a string ({"k": "abc"}) must degrade to NULL, not throw the
    // ANSI cast error and kill the job (and TRY_CAST semantics diverge
    // across engines on fractional strings — the pattern guard is the
    // portable form)
    val kStr = get_json_object(col("props"), "$.k")
    events.select(col("event_type"),
        when(kStr.rlike("^-?[0-9]+$"), kStr.cast("bigint")).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")
  }
}

/** The S7 read/export filter set (reference `filter_match`,
  * `includes/class-events.php:148-155`): each PRESENT field is an
  * equality predicate; absent fields don't constrain. */
final case class EventFilters(
    productId: Option[Long] = None,
    target: Option[String] = None,
    action: Option[String] = None,
    outcome: Option[String] = None) {
  def predicate: org.apache.spark.sql.Column =
    Seq(
      productId.map(col("product_id") === _),
      target.map(col("target") === _),
      action.map(col("action") === _),
      outcome.map(col("outcome") === _))
      .flatten.foldLeft(lit(true))(_ && _)
}
