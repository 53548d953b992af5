package graft

import graft.catalog.Views

/** The spark.sql surface: catalog views + native functions resolve. */
class ViewsSpec extends SparkSpec {

  test("sql over derived views and native functions") {
    Views.register(spark, sfDir)
    assert(spark.sql("SELECT count(*) FROM products").head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM sync_state WHERE status = 'error'").head().getLong(0) > 0)
    val cos = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id
        |WHERE a.vec_id = 0""".stripMargin).head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val chunks = spark.sql(
      """SELECT doc_id, chunk_index, chunk_text
        |FROM (SELECT doc_id, chunk_gen(text, 60, 10) FROM documents)
        |WHERE doc_id = 3""".stripMargin).collect()
    assert(chunks.nonEmpty && chunks.forall(_.getInt(1) >= 0))
  }
}
