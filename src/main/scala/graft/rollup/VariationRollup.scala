package graft.rollup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** A1 — variation rollup: per parent, count + price range + sorted
  * distinct value sets (capped, `+N more`), rendered as a deterministic
  * text block appended to the parent text under strategy `collapse`.
  * Reference `includes/class-variation-rollup.php:22-153`.
  *
  * Scale posture: one hash aggregation on `parent_id` with map-side partial
  * aggregation; `collect_set` stays bounded because the variation scan is
  * capped upstream (reference cap 500/parent) — no skew risk at 100 TB
  * beyond what the cap already bounds.
  */
object VariationRollup {

  /** Rollup table: one row per parent with the aggregates + rendered text. */
  def rollup(products: DataFrame, valuesCap: Int = 20): DataFrame = {
    val children = products
      .where(col("post_type") === "product_variation" &&
        col("post_status") === "publish")
    children.groupBy(col("parent_id"))
      .agg(
        count(lit(1)).as("n_variations"),
        min(col("price").cast("double")).as("price_min"),
        max(col("price").cast("double")).as("price_max"),
        Functions.renderValueSet(collect_list(col("attr_size")), valuesCap)
          .as("sizes"),
        Functions.renderValueSet(collect_list(col("sku")), valuesCap)
          .as("skus"))
      .select(
        col("parent_id"),
        col("n_variations"),
        format_string("%.2f", col("price_min")).as("price_min"),
        format_string("%.2f", col("price_max")).as("price_max"),
        col("sizes"), col("skus"),
        concat(
          lit("Variations: "), col("n_variations"),
          lit("; Price range: "), format_string("%.2f", col("price_min")),
          lit(" - "), format_string("%.2f", col("price_max")),
          lit("; Sizes: "), col("sizes"),
          lit("; SKUs: "), col("skus")).as("rollup_text"))
      .orderBy("parent_id")
  }

  /** Variation strategies (reference enum,
    * `includes/class-options.php:596-607`; candidate routing
    * `includes/class-product-actions.php:202-248`):
    *   separate    → parents AND variations index individually
    *   collapse    → variations suppressed, their rollup folds into parent
    *   parent_only → variations suppressed entirely
    */
  def candidates(products: DataFrame, strategy: String): DataFrame = strategy match {
    case "separate" => products
    case "collapse" | "parent_only" =>
      products.where(col("post_type") =!= "product_variation")
    case other => throw new IllegalArgumentException(
      s"unknown variation strategy '$other' (separate|collapse|parent_only)")
  }

  /** Strategy `collapse`: the parent's normalized text with the rollup
    * block appended (append point `includes/class-indexer.php:122-138`).
    * Parents without published variations keep their text unchanged. */
  def collapseText(products: DataFrame, valuesCap: Int = 20): DataFrame = {
    val parents = products.where(col("post_type") === "product")
    val normalized = graft.normalize.Normalizer.normalize(parents)
    val rolled = rollup(products, valuesCap)
      .select(col("parent_id"), col("rollup_text"))
    normalized
      .join(rolled, normalized("product_id") === rolled("parent_id"), "left_outer")
      .select(col("product_id"),
        concat(col("text"),
          coalesce(concat(lit("\n"), col("rollup_text")), lit(""))).as("text"))
      .orderBy("product_id")
  }
}
