package graft.catalog

/** DuckDB-dialect SQL mirror of [[Catalog]]. The driver registers the raw
  * parquet tables (`part`, `lineitem`, …, `documents`, `embeddings`,
  * `events`) and runs each oracle query; results must hash-match the Spark
  * side. Every derived table here must stay semantically identical to the
  * corresponding [[Catalog]] method.
  */
object OracleSql {

  val Base = Catalog.Base

  /** Shared WITH-prologue defining the derived catalog tables. Appended in
    * front of each oracle query that needs them. */
  val prologue: String =
    s"""WITH parents AS (
       |  SELECT
       |    CAST(p_partkey AS BIGINT) AS product_id,
       |    CAST(0 AS BIGINT) AS parent_id,
       |    'product' AS post_type,
       |    CASE WHEN p_partkey % 10 = 0 THEN 'draft'
       |         WHEN p_partkey % 10 = 1 THEN 'private'
       |         ELSE 'publish' END AS post_status,
       |    TIMESTAMP '$Base' + INTERVAL (p_partkey) MINUTE AS post_modified_gmt,
       |    p_name AS title,
       |    '<p>' || p_type || '</p>' AS description,
       |    'SKU-' || p_partkey AS sku,
       |    printf('%.2f', p_retailprice) AS price,
       |    p_brand AS brand,
       |    CAST(p_size AS INT) AS psize,
       |    CAST(NULL AS VARCHAR) AS attr_size,
       |    1 AS site_id
       |  FROM part
       |), variations AS (
       |  SELECT
       |    CAST(1000000 + p_partkey * 10 + i AS BIGINT) AS product_id,
       |    CAST(p_partkey AS BIGINT) AS parent_id,
       |    'product_variation' AS post_type,
       |    CASE WHEN (p_partkey + i) % 7 = 0 THEN 'draft' ELSE 'publish' END
       |      AS post_status,
       |    TIMESTAMP '$Base' + INTERVAL (p_partkey * 10 + i) MINUTE
       |      AS post_modified_gmt,
       |    p_name || ' - v' || i AS title,
       |    '<p>variant ' || i || '</p>' AS description,
       |    'SKU-' || p_partkey || '-' || i AS sku,
       |    printf('%.2f', p_retailprice + i) AS price,
       |    p_brand AS brand,
       |    CAST(p_size + i AS INT) AS psize,
       |    CASE WHEN i = 1 THEN 'S' WHEN i = 2 THEN 'M' ELSE 'L' END
       |      AS attr_size,
       |    1 AS site_id
       |  FROM part, UNNEST(generate_series(1, 3)) t(i)
       |  WHERE p_partkey % 2 = 0
       |), products AS (
       |  SELECT * FROM parents UNION ALL SELECT * FROM variations
       |), sync_state AS (
       |  SELECT
       |    1 AS site_id,
       |    CAST(p_partkey AS BIGINT) AS product_id,
       |    'local' AS target,
       |    CAST(ci AS INT) AS chunk_index,
       |    'site-1:product-' || p_partkey || ':chunk-' || ci AS vector_id,
       |    sha256('p' || p_partkey) AS product_sha,
       |    sha256('c' || p_partkey || ':' || ci) AS chunk_sha,
       |    'text-embedding-3-small' AS model,
       |    3072 AS dimension,
       |    CASE WHEN p_partkey % 9 = 0 THEN 'error' ELSE 'synced' END AS status,
       |    TIMESTAMP '$Base' + INTERVAL (p_partkey - 10) MINUTE AS updated_at,
       |    TIMESTAMP '$Base' + INTERVAL (p_partkey +
       |      (CASE WHEN p_partkey % 2 = 0 THEN 10 ELSE -10 END)) MINUTE
       |      AS last_synced_at
       |  FROM part, UNNEST(generate_series(0, p_partkey % 3)) t(ci)
       |  WHERE p_partkey % 3 = 0
       |)
       |""".stripMargin

  /** Prefix `sql` with the catalog prologue. */
  def withCatalog(sql: String): String = prologue + sql
}
