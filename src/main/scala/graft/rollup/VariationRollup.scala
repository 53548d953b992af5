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

  private def publishedChildren(products: DataFrame) =
    products.where(col("post_type") === "product_variation" &&
      col("post_status") === "publish")

  /** Generalized attribute rollup (reference iterates EVERY `pa_*`
    * attribute and each selected ACF field, `includes/
    * class-variation-rollup.php:55-95`): long-format
    * (parent_id, attr_key, vals) — children join their attribute rows,
    * `pa_*` slugs prettify (F15), one groupBy per (parent, key) renders
    * the capped sorted distinct set. One shuffle; the attribute join is a
    * narrow equi-join on the variation id. */
  def attributeSets(products: DataFrame, attrs: DataFrame,
      valuesCap: Int = graft.model.Tuning.Default.rollupValuesCap): DataFrame = {
    val pretty = when(col("attr_key").startsWith("pa_"),
      Functions.prettySlug(col("attr_value")))
      .otherwise(col("attr_value"))
    publishedChildren(products).select("product_id", "parent_id")
      .join(attrs, Seq("product_id"))
      .select(col("parent_id"), col("attr_key"), pretty.as("v"))
      .groupBy("parent_id", "attr_key")
      .agg(Functions.renderValueSet(collect_list(col("v")), valuesCap).as("vals"))
      .orderBy("parent_id", "attr_key")
  }

  /** Deterministic display label for an attribute key — `pa_color` →
    * `Color`, `acf:rating` → `ACF Rating`, anything else prettified as-is
    * (reference label resolution `includes/class-variation-rollup.php:
    * 208-232` via wc_attribute_label / acf_label_fallback). */
  def attrLabel(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(key.startsWith("pa_"), Functions.prettySlug(key.substr(lit(4), length(key))))
      .when(key.startsWith("acf:"),
        concat(lit("ACF "), Functions.prettySlug(key.substr(lit(5), length(key)))))
      .otherwise(Functions.prettySlug(key))

  /** Rollup table: one row per parent with the aggregates + rendered text.
    * With `attrs`, EVERY `attributeSets` key — pa_* taxonomies, custom
    * attributes, ACF fields — renders as a `Label: v1, v2 (+N more)`
    * segment, key-sorted, appended to the rollup text (reference renders
    * the full attribute map + ACF block,
    * `includes/class-variation-rollup.php:55-95, 98-153`). */
  def rollup(products: DataFrame, valuesCap: Int = graft.model.Tuning.Default.rollupValuesCap,
      attrs: Option[DataFrame] = None): DataFrame = {
    val base = baseRollup(products, valuesCap)
    attrs match {
      case None => base
      case Some(a) =>
        val lines = attributeSets(products, a, valuesCap)
          .select(col("parent_id"), col("attr_key"),
            concat(attrLabel(col("attr_key")), lit(": "), col("vals")).as("line"))
        // one ordered render per parent: sort by key (unique per parent) so
        // the block is deterministic regardless of aggregation order
        val block = lines.groupBy("parent_id")
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("attr_key"), col("line")))),
              x => x.getField("line")), "; ").as("attrs_text"))
        // a parent with variations but no attribute rows keeps its base
        // text — a null-propagating concat would erase the whole block
        base.join(block, Seq("parent_id"), "left_outer")
          .select(col("parent_id"), col("n_variations"), col("price_min"),
            col("price_max"), col("sizes"), col("skus"), col("attrs_text"),
            concat(col("rollup_text"),
              coalesce(concat(lit("; "), col("attrs_text")), lit("")))
              .as("rollup_text"))
          .orderBy("parent_id")
    }
  }

  private def baseRollup(products: DataFrame, valuesCap: Int): DataFrame = {
    val children = publishedChildren(products)
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
  def collapseText(products: DataFrame, valuesCap: Int = graft.model.Tuning.Default.rollupValuesCap,
      attrs: Option[DataFrame] = None): DataFrame = {
    val parents = products.where(col("post_type") === "product")
    val normalized = graft.normalize.Normalizer.normalize(parents)
    val rolled = rollup(products, valuesCap, attrs)
      .select(col("parent_id"), col("rollup_text"))
    normalized
      .join(rolled, normalized("product_id") === rolled("parent_id"), "left_outer")
      .select(col("product_id"),
        concat(col("text"),
          coalesce(concat(lit("\n"), col("rollup_text")), lit(""))).as("text"))
      .orderBy("product_id")
  }
}
