package graft

import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.rollup.VariationRollup

/** Variation strategies per the reference's test spec
  * (`development-plan.md:2211-2218`): separate indexes both, parent_only
  * suppresses variations, collapse folds the rollup into parent text.
  */
class VariationStrategySpec extends SparkSpec {

  private def products = Catalog.products(spark, sfDir)

  test("separate routes parents AND variations; parent_only suppresses") {
    val sep = VariationRollup.candidates(products, "separate")
    assert(sep.where(col("post_type") === "product_variation").count() > 0)
    val po = VariationRollup.candidates(products, "parent_only")
    assert(po.where(col("post_type") === "product_variation").count() == 0)
    assert(po.count() == products.where(col("post_type") === "product").count())
    intercept[IllegalArgumentException] {
      VariationRollup.candidates(products, "bogus")
    }
  }

  test("collapse: parent text contains the aggregated variation block") {
    val collapsed = VariationRollup.collapseText(products, valuesCap = 2)
    // even part keys have variations -> rollup block present
    val withVars = collapsed.where(col("product_id") % 2 === 0 &&
      col("text").contains("Variations: "))
    assert(withVars.count() > 0)
    val sample = withVars.select("text").head().getString(0)
    assert(sample.contains("Price range: ") && sample.contains("Sizes: "))
    // odd part keys have no variations -> no rollup block
    assert(collapsed.where(col("product_id") % 2 === 1 &&
      col("text").contains("Variations: ")).count() == 0)
  }
}
