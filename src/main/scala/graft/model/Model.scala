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
    model: String = "text-embedding-3-small")

object Selection {
  /** Model → locked dimension. NOTE: the reference's table is intentionally
    * nonstandard (3-small→3072, 3-large→1536 — `includes/class-embeddings.php:17-24`);
    * we replicate it verbatim per SURVEY §7.5.7. */
  val modelDims: Map[String, Int] = Map(
    "text-embedding-3-large" -> 1536,
    "text-embedding-3-small" -> 3072,
    "text-embedding-ada-002" -> 1536)
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
