package graft

import org.apache.spark.sql.functions._

import graft.normalize.Normalizer

/** P3/P4 predicate semantics on the meta pipeline: blacklist always wins,
  * private keys appear only with the flag
  * (reference `includes/class-field-normalizer.php:220-224`,
  * `includes/class-field-discovery.php:149-166`).
  */
class NormalizerSpec extends SparkSpec {

  import spark.implicits._

  private val meta = Seq(
    (1L, "material", "steel"),
    (1L, "_private_note", "secret"),
    (1L, "_edit_lock", "17"),
    (1L, "warranty", "12")).toDF("product_id", "key", "value")

  test("private keys excluded by default; blacklist always excluded") {
    val line = Normalizer.metaSections(meta).select("meta_line").as[String].head()
    assert(line == "material: steel; warranty: 12")
  }

  test("showPrivate admits private keys but never blacklist members") {
    val row = Normalizer.metaSections(meta, showPrivate = true)
      .select("meta_line", "meta_json").head()
    assert(row.getString(0) == "_private_note: secret; material: steel; warranty: 12")
    assert(row.getString(1) ==
      """{"_private_note":"secret","material":"steel","warranty":"12"}""")
  }
}
