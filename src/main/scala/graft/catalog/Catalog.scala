package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical product-catalog derivation over the driver's synthetic TPC-H-ish
  * tables (TESTDATA.md). Mirrors the reference's WooCommerce data model
  * (SURVEY §1.1; reference `includes/class-field-discovery.php:22-36`):
  * `part` rows become products, even part keys fan out into 3 variations
  * (`post_parent` children, reference `includes/class-variation-rollup.php:33-49`),
  * and a deterministic synthetic `sync_state` table stands in for the engine's
  * own bookkeeping store (reference DDL `includes/class-plugin.php:107-131`).
  *
  * Every derivation here has a byte-for-byte SQL mirror in [[OracleSql]] so
  * each operator query gets a DuckDB oracle. Keep the two in lockstep.
  *
  * Scale posture: all derivations are narrow projections + a 3-way explode —
  * no shuffle, fully pipelined into the parquet scan, and column pruning
  * reaches the scan because everything is a `select` over the raw columns.
  */
object Catalog {

  /** Fixed epoch for all derived timestamps (injected clock — SURVEY §7.5.4). */
  val Base = "2024-01-01 00:00:00"

  /** Expected shapes of the DRIVER-OWNED testdata tables — the
    * schema-drift guard the round-7 events breakage taught (the driver
    * regenerated `events.ts` with a new physical type and fourteen
    * queries failed with scattered analysis errors). Each reader now
    * checks its table against this map at read time, so the next silent
    * regeneration becomes ONE clear message naming the table and the
    * drift instead. Acceptance sets are deliberately tolerant of
    * harmless re-typings (integer widths, float widths, the known
    * timestamp vintages [[events]] already branches on); only a type
    * outside the set — the kind that breaks readers or oracles — trips
    * the guard. Extra columns are allowed. */
  private val ints = Set("int", "bigint", "smallint")
  private val floats = Set("float", "double")
  private val text = Set("string")
  // the three events.ts vintages the reader branches on: micros
  // (timestamp), micros-NTZ (timestamp_ntz), nanos-as-long (bigint)
  private val tsVintages = Set("timestamp", "timestamp_ntz", "bigint")
  private val expectedColumns: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> ints, "r_name" -> text),
    "nation" -> Seq("n_nationkey" -> ints, "n_name" -> text,
      "n_regionkey" -> ints),
    "customer" -> Seq("c_custkey" -> ints, "c_name" -> text,
      "c_nationkey" -> ints, "c_acctbal" -> floats, "c_mktsegment" -> text),
    "supplier" -> Seq("s_suppkey" -> ints, "s_name" -> text,
      "s_nationkey" -> ints, "s_acctbal" -> floats),
    "part" -> Seq("p_partkey" -> ints, "p_name" -> text, "p_brand" -> text,
      "p_type" -> text, "p_size" -> ints, "p_retailprice" -> floats),
    "orders" -> Seq("o_orderkey" -> ints, "o_custkey" -> ints,
      "o_orderstatus" -> text, "o_totalprice" -> floats,
      "o_orderdate" -> tsVintages, "o_orderpriority" -> text),
    "lineitem" -> Seq("l_orderkey" -> ints, "l_partkey" -> ints,
      "l_suppkey" -> ints, "l_linenumber" -> ints, "l_quantity" -> floats,
      "l_extendedprice" -> floats, "l_discount" -> floats, "l_tax" -> floats,
      "l_returnflag" -> text, "l_linestatus" -> text,
      "l_shipdate" -> tsVintages),
    "events" -> Seq("event_id" -> ints, "ts" -> tsVintages,
      "user_id" -> ints, "event_type" -> text, "value" -> floats,
      "props" -> text),
    "documents" -> Seq("doc_id" -> ints, "text" -> text, "lang" -> text,
      "source" -> text, "n_chars" -> ints),
    "embeddings" -> Seq("vec_id" -> ints,
      "embedding" -> Set("array<float>", "array<double>"), "label" -> ints))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    for (expected <- expectedColumns.get(name)) {
      val actual = df.schema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
      val drifts = expected.flatMap { case (c, ok) =>
        actual.get(c) match {
          case None => Some(s"missing column: $c")
          case Some(t) if !ok(t) =>
            Some(s"$c: expected one of ${ok.toSeq.sorted.mkString("{", ", ", "}")}, found $t")
          case _ => None
        }
      }
      if (drifts.nonEmpty) throw new IllegalStateException(
        s"testdata table '$name' at $dir drifted from its expected schema:\n  " +
          drifts.mkString("\n  ") +
          "\n(the driver likely regenerated this parquet with a new physical " +
          "type — extend Catalog.expectedColumns / the reader branch; see " +
          "Catalog.events for the ts-vintage pattern)")
    }
    df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** The events parquet's `ts` physical type has varied across driver
    * regenerations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as long via the legacy conf, then integer-divide to
    * micros; a double round-trip would lose precision above 2^53 ns) and
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark 4 infers
    * as TIMESTAMP_NTZ — cast to TIMESTAMP; exact under the project-wide
    * UTC session timezone, and required because the temporal operators'
    * `unix_micros` rejects NTZ). Branch on the read schema so any
    * vintage of the file works unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a session-zoned timestamp
    }
  }

  /** Event-log VIEW over the synthetic events stream in the reference's
    * log-row shape — ts/site_id/product_id/target/action/outcome/
    * duration_ms, the CSV header of `includes/class-events.php:105` — so
    * S7's four real filters (`filter_match` `:148-155`) act on their
    * actual columns. Derivations are deterministic so the DuckDB oracle
    * mirrors them exactly. */
  def eventLog(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      col("ts"),
      lit(1).as("site_id"),
      col("user_id").as("product_id"),
      when(get_json_object(col("props"), "$.k").cast("int") % 2 === 0, "local")
        .otherwise("vs").as("target"),
      col("event_type").as("action"),
      when(col("event_type") === "error", "error").otherwise("success")
        .as("outcome"),
      round(col("value"), 2).as("duration_ms"))

  /** Parent products: one per `part` row. */
  def parents(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey").cast("bigint").as("product_id"),
      lit(0L).as("parent_id"),
      lit("product").as("post_type"),
      when(col("p_partkey") % 10 === 0, "draft")
        .when(col("p_partkey") % 10 === 1, "private")
        .otherwise("publish").as("post_status"),
      expr(s"timestamp'$Base' + make_interval(0,0,0,0,0,p_partkey,0)")
        .as("post_modified_gmt"),
      col("p_name").as("title"),
      concat(lit("<p>"), col("p_type"), lit("</p>")).as("description"),
      concat(lit("SKU-"), col("p_partkey")).as("sku"),
      format_string("%.2f", col("p_retailprice")).as("price"),
      col("p_brand").as("brand"),
      col("p_size").cast("int").as("psize"),
      lit(null).cast("string").as("attr_size"),
      lit(1).as("site_id"))

  /** Variation children: parts with even keys fan into 3 `product_variation`
    * rows (reference variation model, `class-variation-rollup.php:33-49`). */
  def variations(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .where(col("p_partkey") % 2 === 0)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        col("p_retailprice"), explode(sequence(lit(1), lit(3))).as("i"))
      .select(
        (lit(1000000L) + col("p_partkey") * 10 + col("i")).as("product_id"),
        col("p_partkey").cast("bigint").as("parent_id"),
        lit("product_variation").as("post_type"),
        when((col("p_partkey") + col("i")) % 7 === 0, "draft")
          .otherwise("publish").as("post_status"),
        expr(s"timestamp'$Base' + make_interval(0,0,0,0,0,p_partkey*10+i,0)")
          .as("post_modified_gmt"),
        concat(col("p_name"), lit(" - v"), col("i")).as("title"),
        concat(lit("<p>variant "), col("i"), lit("</p>")).as("description"),
        concat(lit("SKU-"), col("p_partkey"), lit("-"), col("i")).as("sku"),
        format_string("%.2f", col("p_retailprice") + col("i")).as("price"),
        col("p_brand").as("brand"),
        (col("p_size") + col("i")).cast("int").as("psize"),
        when(col("i") === 1, "S").when(col("i") === 2, "M")
          .otherwise("L").as("attr_size"),
        lit(1).as("site_id"))

  /** Full catalog: parents ∪ variations, produced in ONE `part` scan — a
    * conditional explode emits i=0 (the parent row) always and i=1..3
    * (variation rows) for even keys, with each column a when/otherwise on
    * i. Semantically identical to `parents.unionByName(variations)` (the
    * oracle prologue keeps the two-CTE form) but every consumer pays one
    * scan and one codegen stage instead of two. */
  def products(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir).select(
      col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
      col("p_retailprice"), col("p_type"),
      explode(when(col("p_partkey") % 2 === 0, sequence(lit(0), lit(3)))
        .otherwise(sequence(lit(0), lit(0)))).as("i"))
    val isP = col("i") === 0
    p.select(
      when(isP, col("p_partkey").cast("bigint"))
        .otherwise(lit(1000000L) + col("p_partkey") * 10 + col("i"))
        .as("product_id"),
      when(isP, lit(0L)).otherwise(col("p_partkey").cast("bigint"))
        .as("parent_id"),
      when(isP, "product").otherwise("product_variation").as("post_type"),
      when(isP,
        when(col("p_partkey") % 10 === 0, "draft")
          .when(col("p_partkey") % 10 === 1, "private")
          .otherwise("publish"))
        .otherwise(when((col("p_partkey") + col("i")) % 7 === 0, "draft")
          .otherwise("publish"))
        .as("post_status"),
      when(isP, expr(s"timestamp'$Base' + make_interval(0,0,0,0,0,p_partkey,0)"))
        .otherwise(expr(s"timestamp'$Base' + make_interval(0,0,0,0,0,p_partkey*10+i,0)"))
        .as("post_modified_gmt"),
      when(isP, col("p_name"))
        .otherwise(concat(col("p_name"), lit(" - v"), col("i"))).as("title"),
      when(isP, concat(lit("<p>"), col("p_type"), lit("</p>")))
        .otherwise(concat(lit("<p>variant "), col("i"), lit("</p>")))
        .as("description"),
      when(isP, concat(lit("SKU-"), col("p_partkey")))
        .otherwise(concat(lit("SKU-"), col("p_partkey"), lit("-"), col("i")))
        .as("sku"),
      when(isP, format_string("%.2f", col("p_retailprice")))
        .otherwise(format_string("%.2f", col("p_retailprice") + col("i")))
        .as("price"),
      col("p_brand").as("brand"),
      when(isP, col("p_size")).otherwise(col("p_size") + col("i"))
        .cast("int").as("psize"),
      when(col("i") === 1, "S").when(col("i") === 2, "M")
        .when(col("i") === 3, "L")
        .otherwise(lit(null).cast("string")).as("attr_size"),
      lit(1).as("site_id"))
  }

  /** Custom-meta rows (the reference's `get_post_meta` key/value pairs,
    * SURVEY §1.1): deterministic long-format (product_id, key, value) with
    * `_`-prefixed private keys and blacklist members mixed in, so the
    * P3/P4 predicates have something to filter. */
  def productMeta(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    val rows = Seq(
      ("material", col("p_type")),
      ("container", concat(lit("PKG-"), col("p_size"))),
      ("_edit_lock", concat(lit("17000000"), col("p_partkey") % 10)),
      ("_private_note", concat(lit("note-"), col("p_partkey"))),
      ("warranty_months", (col("p_partkey") % 36 + 1).cast("string")))
    p.select(col("p_partkey").cast("bigint").as("product_id"),
        explode(array(rows.map { case (k, v) =>
          struct(lit(k).as("key"), v.cast("string").as("value")) }: _*)).as("kv"))
      .select(col("product_id"), col("kv.key").as("key"), col("kv.value").as("value"))
  }

  /** Taxonomy term rows (the reference's `wp_get_post_terms` reads,
    * SURVEY §1.1 / S4): long-format (product_id, taxonomy, term). Parents
    * get a category + up to two tags; `pa_*` attribute taxonomies carry
    * raw slugs the F15 prettifier renders. */
  def productTerms(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    val rows = Seq(
      ("product_cat", concat(lit("cat-"), col("p_partkey") % 8)),
      ("product_tag", concat(lit("tag-"), col("p_partkey") % 5)),
      ("pa_color",
        when(col("p_partkey") % 3 === 0, "royal-blue")
          .when(col("p_partkey") % 3 === 1, "forest-green")
          .otherwise("matte_black")),
      ("pa_finish",
        when(col("p_partkey") % 2 === 0, "brushed-steel").otherwise("oiled_oak")))
    p.select(col("p_partkey").cast("bigint").as("product_id"),
        explode(array(rows.map { case (t, v) =>
          struct(lit(t).as("taxonomy"), v.cast("string").as("term")) }: _*)).as("t"))
      .select(col("product_id"), col("t.taxonomy").as("taxonomy"),
        col("t.term").as("term"))
  }

  /** ACF-style typed dynamic fields (reference type matrix
    * `includes/class-field-normalizer.php:327-444`, discovery
    * `includes/class-acf-integration.php:30-118`): long-format
    * (product_id, field_name, field_type, value). Multi-values are
    * `|`-packed, group fields `k=v|k2=v2` — the renderer (F11) unpacks. */
  def acfValues(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    val rows = Seq(
      ("highlight", "text", col("p_name")),
      ("is_featured", "true_false", (col("p_partkey") % 2).cast("string")),
      ("rating", "number", (col("p_partkey") % 5 + 1).cast("string")),
      ("release_date", "date",
        date_format(expr(s"timestamp'$Base' + make_interval(0,0,0,p_partkey,0,0,0)"),
          "yyyy-MM-dd")),
      ("colors", "checkbox",
        when(col("p_partkey") % 3 === 0, "red|blue")
          .when(col("p_partkey") % 3 === 1, "green")
          .otherwise("red|green|blue")),
      ("spec", "group",
        concat(lit("w="), col("p_size"), lit("|brand="), col("p_brand"))))
    p.select(col("p_partkey").cast("bigint").as("product_id"),
        explode(array(rows.map { case (n, t, v) =>
          struct(lit(n).as("field_name"), lit(t).as("field_type"),
            v.cast("string").as("value")) }: _*)).as("f"))
      .select(col("product_id"), col("f.field_name").as("field_name"),
        col("f.field_type").as("field_type"), col("f.value").as("value"))
  }

  /** Attachment dimension (media-library stand-in for the reference's
    * image/gallery/file lookups, `includes/class-field-normalizer.php:
    * 388-430`): alt/caption/url with deterministic gaps so the image
    * render preference (alt → caption → url) is exercised. */
  def attachments(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey").cast("bigint").as("attachment_id"),
      when(col("p_partkey") % 4 === 0, lit(""))
        .otherwise(concat(lit("Alt "), col("p_name"))).as("alt"),
      when(col("p_partkey") % 2 === 0, concat(lit("Caption "), col("p_partkey")))
        .otherwise(lit("")).as("caption"),
      concat(lit("https://example.test/media/"), col("p_partkey"), lit(".jpg"))
        .as("url"))

  /** Taxonomy-term dimension for ACF taxonomy-id lookups (`nation` plays
    * the terms table): (term_id, term_name). One definition for every
    * consumer so the oracle mirrors can't drift from a call site. */
  def termDim(spark: SparkSession, dir: String): DataFrame =
    nation(spark, dir).select(
      col("n_nationkey").cast("bigint").as("term_id"),
      col("n_name").as("term_name"))

  /** Post-title dimension for post_object / relationship lookups
    * (the reference resolves post ids to titles,
    * `includes/class-field-normalizer.php:369-386`). */
  def postTitles(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey").cast("bigint").as("ref_pid"),
      col("p_name").as("ref_title"))

  /** ACF id-lookup + nested typed fields (the 10 types beyond
    * [[acfValues]]'s scalar six — together the full 16-type matrix of
    * `includes/class-field-normalizer.php:327-444`): long-format
    * (product_id, field_name, field_type, value). Id lists are `|`-packed;
    * repeater rows are `k=v,k2=v2|…`; flexible layouts are
    * `layout:k=v,…|…`. All referenced ids exist at every SF (part has
    * ≥200 rows at sf0.001; taxonomy ids resolve against `nation`). */
  def acfLookupValues(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    val pk = col("p_partkey")
    val rows = Seq(
      ("badge", "taxonomy", (pk % 25).cast("string")),
      ("related", "post_object", (pk % 100 + 1).cast("string")),
      ("cross_sells", "relationship",
        concat(pk % 100 + 1, lit("|"), pk % 100 + 51)),
      ("hero_image", "image", (pk % 199 + 1).cast("string")),
      ("gallery_imgs", "gallery",
        concat(pk % 199 + 1, lit("|"), pk % 199 + 2)),
      ("spec_sheet", "file", (pk % 197 + 3).cast("string")),
      ("features", "repeater",
        concat(lit("name="), col("p_name"), lit(",qty="), pk % 9 + 1,
          lit("|name="), col("p_brand"), lit(",qty="), pk % 5 + 1)),
      ("sections", "flexible_content",
        concat(lit("intro:text="), col("p_type"),
          lit("|dims:w="), col("p_size"), lit(",h="), pk % 40)),
      ("blurb", "wysiwyg",
        concat(lit("<b>"), col("p_name"), lit("</b> <i>"), col("p_type"), lit("</i>"))),
      ("container_sel", "select", concat(lit("PKG-"), col("p_size"))))
    p.select(pk.cast("bigint").as("product_id"),
        explode(array(rows.map { case (n, t, v) =>
          struct(lit(n).as("field_name"), lit(t).as("field_type"),
            v.cast("string").as("value")) }: _*)).as("f"))
      .select(col("product_id"), col("f.field_name").as("field_name"),
        col("f.field_type").as("field_type"), col("f.value").as("value"))
  }

  /** Per-variation attribute rows for the generalized A1 rollup
    * (reference aggregates EVERY `pa_*` attribute and selected ACF field,
    * `includes/class-variation-rollup.php:55-95`): long-format
    * (product_id, attr_key, attr_value) for the variation children. */
  def variationAttributes(spark: SparkSession, dir: String): DataFrame = {
    val base = part(spark, dir)
      .where(col("p_partkey") % 2 === 0)
      .select(col("p_partkey"), explode(sequence(lit(1), lit(3))).as("i"))
      .select((lit(1000000L) + col("p_partkey") * 10 + col("i")).as("product_id"),
        col("p_partkey"), col("i"))
    val rows = Seq(
      ("attr_size",
        when(col("i") === 1, "S").when(col("i") === 2, "M").otherwise("L")),
      // i² mod 3 cycles {1,1,0} — parents get TWO distinct colors that
      // shift with the key, so the cap/`+N more` paths both occur
      ("pa_color",
        when((col("p_partkey") + col("i") * col("i")) % 3 === 0, "royal-blue")
          .when((col("p_partkey") + col("i") * col("i")) % 3 === 1, "forest-green")
          .otherwise("matte_black")),
      ("acf:rating", ((col("p_partkey") + col("i")) % 5 + 1).cast("string")))
    base.select(col("product_id"),
        explode(array(rows.map { case (k, v) =>
          struct(lit(k).as("attr_key"), v.cast("string").as("attr_value")) }: _*)).as("a"))
      .select(col("product_id"), col("a.attr_key").as("attr_key"),
        col("a.attr_value").as("attr_value"))
  }

  /** Synthetic lifecycle-CDC rows (the T1 hook payloads: what saved, from
    * which status to which): deterministic status transitions over part
    * keys, with non-product types mixed in so the router's P6 skip path
    * has work. */
  def lifecycleCdc(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey").cast("bigint").as("product_id"),
      when(col("p_partkey") % 7 === 0, "revision")
        .when(col("p_partkey") % 7 === 1, "page")
        .when(col("p_partkey") % 2 === 0, "product")
        .otherwise("product_variation").as("post_type"),
      when(col("p_partkey") % 4 === 0, "publish")
        .when(col("p_partkey") % 4 === 1, "draft")
        .when(col("p_partkey") % 4 === 2, "publish")
        .otherwise("pending").as("old_status"),
      when(col("p_partkey") % 3 === 0, "publish")
        .when(col("p_partkey") % 3 === 1, "draft")
        .otherwise("trash").as("new_status"))

  /** Deterministic synthetic sync-state: products with `p_partkey % 3 == 0`
    * have `1 + pk % 3` chunk rows each; even keys are freshly synced, odd
    * keys are stale; `pk % 9 == 0` rows are errored.
    * Shapes match the reference DDL (`includes/class-plugin.php:107-131`). */
  def syncState(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .where(col("p_partkey") % 3 === 0)
      .select(col("p_partkey"),
        explode(sequence(lit(0), (col("p_partkey") % 3).cast("int"))).as("ci"))
      .select(
        lit(1).as("site_id"),
        col("p_partkey").cast("bigint").as("product_id"),
        lit("local").as("target"),
        col("ci").cast("int").as("chunk_index"),
        concat(lit("site-1:product-"), col("p_partkey"), lit(":chunk-"), col("ci"))
          .as("vector_id"),
        sha2(concat(lit("p"), col("p_partkey")), 256).as("product_sha"),
        sha2(concat(lit("c"), col("p_partkey"), lit(":"), col("ci")), 256)
          .as("chunk_sha"),
        lit("text-embedding-3-small").as("model"),
        lit(3072).as("dimension"),
        when(col("p_partkey") % 9 === 0, "error").otherwise("synced").as("status"),
        expr(s"timestamp'$Base' + make_interval(0,0,0,0,0,p_partkey-10,0)")
          .as("updated_at"),
        expr(s"timestamp'$Base' + make_interval(0,0,0,0,0," +
          "p_partkey + (case when p_partkey % 2 = 0 then 10 else -10 end),0)")
          .as("last_synced_at"))
}
