package graft.catalog

import org.apache.spark.sql.SparkSession

import graft.expressions.GraftFunctions

/** SQL surface: register the raw test tables, the derived catalog tables,
  * and graft's native functions as session temp views/functions so every
  * operator is reachable through `spark.sql(...)` as well as the
  * DataFrame API.
  */
object Views {

  val RawTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    RawTables.foreach { t =>
      Catalog.table(spark, dir, t).createOrReplaceTempView(t)
    }
    Catalog.events(spark, dir).createOrReplaceTempView("events")
    Catalog.products(spark, dir).createOrReplaceTempView("products")
    Catalog.productMeta(spark, dir).createOrReplaceTempView("product_meta")
    Catalog.productTerms(spark, dir).createOrReplaceTempView("product_terms")
    Catalog.acfValues(spark, dir).createOrReplaceTempView("acf_values")
    Catalog.syncState(spark, dir).createOrReplaceTempView("sync_state")
    GraftFunctions.ensureRegistered(spark)
  }
}
