package graft

import graft.normalize.Normalizer
import graft.rollup.VariationRollup

/** F11 full-matrix fixtures (dev-plan normalizer matrix,
  * `development-plan.md:674-680`; reference type switch
  * `includes/class-field-normalizer.php:327-444`): every id-lookup type
  * resolves through its dimension join, multi-value order is preserved,
  * the image render prefers alt → caption → url, and repeater/flexible
  * unpack nested rows. Plus the generalized A1 attribute rollup.
  */
class AcfLookupSpec extends SparkSpec {

  import spark.implicits._

  private val titles = Seq((10L, "Alpha"), (11L, "Beta"), (12L, "Gamma"))
    .toDF("ref_pid", "ref_title")
  private val terms = Seq((1L, "Widgets"), (2L, "Gadgets"))
    .toDF("term_id", "term_name")
  private val attachments = Seq(
    (20L, "Nice alt", "Cap 20", "https://x/20.jpg"),
    (21L, "", "Cap 21", "https://x/21.jpg"),
    (22L, "", "", "https://x/22.jpg"))
    .toDF("attachment_id", "alt", "caption", "url")

  private def render(rows: (Long, String, String, String)*): Map[String, String] = {
    val acf = rows.toSeq.toDF("product_id", "field_name", "field_type", "value")
    Normalizer.acfRenderLookup(acf, titles, terms, attachments)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
  }

  test("taxonomy, post_object, file resolve through dimension joins") {
    val out = render(
      (1L, "cat", "taxonomy", "2"),
      (1L, "rel", "post_object", "11"),
      (1L, "pdf", "file", "22"))
    assert(out("cat") == "Gadgets")
    assert(out("rel") == "Beta")
    assert(out("pdf") == "https://x/22.jpg")
  }

  test("relationship and gallery preserve authoring order") {
    val out = render(
      (1L, "xs", "relationship", "12|10|11"),
      (1L, "gal", "gallery", "21|20"))
    assert(out("xs") == "Gamma, Alpha, Beta")
    assert(out("gal") == "Cap 21, Nice alt")
  }

  test("image render prefers alt, then caption, then url") {
    val out = render(
      (1L, "a", "image", "20"),
      (1L, "b", "image", "21"),
      (1L, "c", "image", "22"))
    assert(out("a") == "Nice alt")
    assert(out("b") == "Cap 21")
    assert(out("c") == "https://x/22.jpg")
  }

  test("repeater and flexible_content unpack nested rows; wysiwyg strips") {
    val out = render(
      (1L, "feats", "repeater", "name=Fast,qty=2|name=Light,qty=5"),
      (1L, "secs", "flexible_content", "intro:text=Hello|dims:w=3,h=4"),
      (1L, "blurb", "wysiwyg", "<b>Bold</b>  <i>claim</i>"),
      (1L, "sel", "select", "PKG-9"))
    assert(out("feats") == "name: Fast; qty: 2 / name: Light; qty: 5")
    assert(out("secs") == "intro — text: Hello / dims — w: 3; h: 4")
    assert(out("blurb") == "Bold claim")
    assert(out("sel") == "PKG-9")
  }

  test("generalized rollup: per-attribute distinct sets, pa_* prettified, capped") {
    val products = Seq(
      (100L, 0L, "product", "publish"),
      (101L, 100L, "product_variation", "publish"),
      (102L, 100L, "product_variation", "publish"),
      (103L, 100L, "product_variation", "publish"),
      (104L, 100L, "product_variation", "draft"))
      .toDF("product_id", "parent_id", "post_type", "post_status")
    val attrs = Seq(
      (101L, "pa_color", "royal-blue"), (102L, "pa_color", "matte_black"),
      (103L, "pa_color", "royal-blue"),
      (101L, "attr_size", "S"), (102L, "attr_size", "M"), (103L, "attr_size", "L"),
      (101L, "acf:rating", "4"), (102L, "acf:rating", "5"), (103L, "acf:rating", "4"),
      (104L, "pa_color", "draft-only-ignored"))
      .toDF("product_id", "attr_key", "attr_value")
    val out = VariationRollup.attributeSets(products, attrs, valuesCap = 2)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(out("pa_color") == "Matte Black, Royal Blue")
    assert(out("attr_size") == "L, M (+1 more)")
    assert(out("acf:rating") == "4, 5")
  }
}
