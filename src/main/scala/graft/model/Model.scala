package graft.model

/** Core typed model of the pipeline (SURVEY §1.1).
  *
  * Mirrors the reference's fundamental abstractions:
  *  - Chunk           — reference `includes/class-chunker.php:92-101`
  *  - VectorMeta /
  *    Payload         — reference `includes/class-indexer.php:101-116`
  *  - SyncRow         — reference DDL `includes/class-plugin.php:107-131`
  *  - SyncSummary     — reference `includes/class-indexer.php:468-477`
  *  - Selection       — reference `includes/class-options.php:63-73`
  *  - EventRow        — reference `includes/class-events.php:18-47`
  */
final case class Chunk(index: Int, text: String, chars: Int, approxTokens: Int)

final case class VectorMeta(
    siteId: Int,
    productId: Long,
    sku: String,
    url: String,
    updatedAt: String,
    fingerprint: String,
    fields: Seq[String])

final case class Payload(id: String, values: Array[Float], metadata: VectorMeta)

final case class SyncRow(
    siteId: Int,
    productId: Long,
    target: String,
    chunkIndex: Int,
    vectorId: String,
    productSha: String,
    chunkSha: String,
    model: String,
    dimension: Int,
    status: String,
    errorCode: String,
    errorMsg: String,
    lastSyncedAt: String,
    updatedAt: String)

final case class SyncSummary(
    target: String,
    productId: Long,
    upserted: Long,
    deleted: Long,
    skipped: Long,
    chunksTotal: Long,
    productSha: String)

/** The "field selection map" — the engine's logical-plan input
  * (reference `includes/class-options.php:368-421`). */
final case class Selection(
    core: Seq[String] = Seq("title", "description", "sku", "price"),
    tax: Seq[String] = Nil,
    attributes: Seq[String] = Nil,
    meta: Map[String, String] = Map.empty, // key -> mode (text|json)
    acf: Seq[String] = Nil, // ACF field names; empty = all discovered
    showPrivateMeta: Boolean = false,
    chunkSize: Int = 800,
    chunkOverlap: Int = 100,
    model: String = "text-embedding-3-small") {

  /** The reference's declared input contract (`class-options.php:368-421`
    * `set_selected_fields` — every config write passes through deep
    * sanitization): field lists are trimmed, emptied of blanks and
    * deduplicated order-preserving; meta keys likewise with mode coerced
    * to `json`|`text`; `chunking.size` clamps to ≥ 1 and
    * `chunking.overlap` to ≥ 0 (`:414-417`), with overlap < size so a
    * chunk always advances; an unknown model falls back to the default
    * (`class-embeddings.php` resolves dimension by model — an unknown
    * model has none). Idempotent: `sanitized.sanitized == sanitized`. */
  def sanitized: Selection = {
    def strs(xs: Seq[String]): Seq[String] =
      xs.iterator.map(s => Option(s).getOrElse("").trim)
        .filter(_.nonEmpty).distinct.toSeq
    val size = math.max(1, chunkSize)
    Selection(
      core = strs(core),
      tax = strs(tax),
      attributes = strs(attributes),
      meta = meta.iterator
        .map { case (k, m) =>
          Option(k).getOrElse("").trim -> (if (m == "json") "json" else "text") }
        .filter(_._1.nonEmpty).toMap,
      acf = strs(acf),
      showPrivateMeta = showPrivateMeta,
      chunkSize = size,
      chunkOverlap = math.min(math.max(0, chunkOverlap), size - 1),
      model =
        if (Selection.modelDims.contains(model)) model
        else Selection.DefaultModel)
  }
}

object Selection {
  val DefaultModel = "text-embedding-3-small"

  /** The all-defaults instance (same hoist rationale as [[Tuning.Default]]). */
  val Default: Selection = Selection()

  /** Model → locked dimension. NOTE: the reference's table is intentionally
    * nonstandard (3-small→3072, 3-large→1536 — `includes/class-embeddings.php:17-24`);
    * we replicate it verbatim per SURVEY §7.5.7. */
  val modelDims: Map[String, Int] = Map(
    "text-embedding-3-large" -> 1536,
    "text-embedding-3-small" -> 3072,
    "text-embedding-ada-002" -> 1536)
}

/** Operational knobs with the reference's clamps — the get/set pairs in
  * `class-options.php` all correct out-of-range input instead of
  * rejecting it:
  *   batch upsert 10–500 default 100 (`:453-460`), concurrent jobs 1–10
  *   default 3 (`:477-484`), scan batch 20–2000 default 200 (`:486-493`),
  *   event-log retention days 1–90 default 7 (`:552-559`), rollup max
  *   variations 20–5000 default 500 (`:626-632`), rollup values cap
  *   5–200 default 20 (`:638-646`), scheduler cadence from a closed enum
  *   default 15min (`:469-475`).
  * Consumers: scan/loop clamp --limit/--quota via scanBatchLimit /
  * maxConcurrentJobs; SyncEngine batches payloads at batchUpsertSize;
  * EventLog.prune defaults to eventRetentionDays; VariationRollup's
  * valuesCap defaults to rollupValuesCap. rollupMaxVariations and
  * schedulerCadence are validated contract surface for callers (the cli
  * loop runs synchronous ticks — no wall-clock scheduler in a test
  * harness). Idempotent: `sanitized.sanitized == sanitized`. */
final case class Tuning(
    batchUpsertSize: Int = 100,
    maxConcurrentJobs: Int = 3,
    scanBatchLimit: Int = 200,
    eventRetentionDays: Int = 7,
    rollupMaxVariations: Int = 500,
    rollupValuesCap: Int = 20,
    schedulerCadence: String = "15min") {
  def sanitized: Tuning = Tuning(
    batchUpsertSize = batchUpsertSize.max(10).min(500),
    maxConcurrentJobs = maxConcurrentJobs.max(1).min(10),
    scanBatchLimit = scanBatchLimit.max(20).min(2000),
    eventRetentionDays = eventRetentionDays.max(1).min(90),
    rollupMaxVariations = rollupMaxVariations.max(20).min(5000),
    rollupValuesCap = rollupValuesCap.max(5).min(200),
    schedulerCadence =
      if (Tuning.Cadences(schedulerCadence)) schedulerCadence else "15min")
}

object Tuning {
  val Cadences: Set[String] =
    Set("5min", "15min", "hourly", "twicedaily", "daily")

  /** The all-defaults instance, hoisted so default arguments reading one
    * knob (`EventLog.prune`, the rollup `valuesCap`s) don't construct a
    * fresh case class per call. */
  val Default: Tuning = Tuning()
}

final case class EventRow(
    ts: String,
    siteId: Int,
    productId: Long,
    target: String,
    action: String,
    outcome: String,
    message: String,
    durationMs: Long,
    count: Long)
