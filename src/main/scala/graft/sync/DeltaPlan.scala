package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4 — the chunk-delta join, "the heart of the engine"
  * (reference `includes/class-indexer.php:362-388`): full-outer join of
  * existing sync-state chunks vs freshly computed chunks on
  * `(product_id, chunk_index)`, routing each row to delete / upsert / skip:
  *   - existing ∖ fresh            → delete
  *   - fresh ∖ existing            → upsert
  *   - chunk_sha mismatch          → upsert
  *   - otherwise                   → skip
  *
  * Scale posture: one shuffled full-outer equi-join keyed on
  * `(doc_id, idx)` — the natural partition key at 100 TB; both sides are
  * pre-projected to (key, sha) so the shuffle carries 3 narrow columns,
  * not chunk text. AQE handles skew (one hot document cannot exceed its own
  * chunk count).
  */
object DeltaPlan {

  /** Route existing-vs-fresh chunk sets to actions. Inputs must have
    * columns (doc_id, idx, sha). */
  def route(fresh: DataFrame, existing: DataFrame): DataFrame = {
    val f = fresh.select(col("doc_id"), col("idx"), col("sha").as("f_sha"))
    val e = existing.select(col("doc_id"), col("idx"), col("sha").as("e_sha"))
    f.join(e, Seq("doc_id", "idx"), "full_outer")
      .select(col("doc_id"), col("idx"),
        when(col("f_sha").isNull, "delete")
          .when(col("e_sha").isNull, "upsert")
          .when(col("e_sha") =!= col("f_sha"), "upsert")
          .otherwise("skip").as("action"))
  }

  /** Fixed-width char-window chunking of `documents.text` (the
    * SQL-expressible stand-in for the sentence-aware chunker, used by the
    * oracle-checked delta plan; the real chunker lives in
    * [[graft.chunker.Chunker]]). One row per (doc_id, idx, sha). */
  def windowChunks(docs: DataFrame, textCol: String, width: Int): DataFrame =
    docs
      .select(col("doc_id"), col(textCol).as("t"), length(col(textCol)).as("len"))
      .where(col("len") > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), ceil(col("len") / lit(width.toDouble)).cast("int") - 1))
          .as("idx"))
      .select(col("doc_id"), col("idx"),
        sha2(col("t").substr(col("idx") * width + 1, lit(width)), 256).as("sha"))

  /** The oracle-checked delta scenario: fresh = current documents text;
    * existing = a deterministic prior state where every 5th doc's text
    * changed (sha mismatch → upsert) and every 7th doc used to be 300 chars
    * longer (stale trailing chunks → delete). */
  def documentsDelta(documents: DataFrame, width: Int = 200): DataFrame = {
    val fresh = windowChunks(documents, "text", width)
    val oldDocs = documents.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(lit("OLD:"), col("text")))
        .otherwise(col("text")).as("old_text"))
      .select(col("doc_id"),
        rpad(col("old_text"),
          length(col("old_text")) +
            when(col("doc_id") % 7 === 0, 300).otherwise(0), lit("x")).as("text"))
    val existing = windowChunks(oldDocs, "text", width)
    route(fresh, existing).orderBy("doc_id", "idx")
  }

  /** A4 — sync summary: counts per action (reference
    * `includes/class-indexer.php:468-477`). */
  def summary(delta: DataFrame): DataFrame =
    delta.groupBy("action").agg(count(lit(1)).as("n")).orderBy("action")
}
