package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.LexIndex

/** Inverted-index contracts: search equals corpus-recomputed BM25, the
  * query plan touches only the query terms' postings (filter pushed to
  * the posting scan), rebuild publication is atomic, and the hybrid
  * fusion is the exact integer RRF of its two input rankings. */
class LexIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = catalog.Catalog.documents(spark, sfDir)

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("lex_").toString
    LexIndex.build(spark, docs, root)
    root
  }

  test("search equals the corpus-recomputed BM25 ranking (the driver oracle's math)") {
    val root = freshIndex()
    val got = LexIndex.search(spark, root, Seq("vector", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 10)
    // ranks are 1..10 in strictly non-increasing score order
    assert(got.map(_._3).toSeq == (1 to 10))
    assert(got.sliding(2).forall(p => p(0)._2 > p(1)._2 ||
      (p(0)._2 == p(1)._2 && p(0)._1 < p(1)._1)))
    // determinism: a second search is byte-identical
    val again = LexIndex.search(spark, root, Seq("vector", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("unknown terms contribute nothing; empty term list returns no rows") {
    val root = freshIndex()
    val base = LexIndex.search(spark, root, Seq("vector"), k = 5).collect()
    val withJunk = LexIndex.search(spark, root,
      Seq("vector", "zzzznotaword"), k = 5).collect()
    assert(base.map(_.getLong(0)).toSeq == withJunk.map(_.getLong(0)).toSeq)
    assert(LexIndex.search(spark, root, Seq.empty, k = 5).count() == 0)
  }

  test("the query reads only its terms' postings: token IN pushes to the posting scan") {
    val root = freshIndex()
    val p = LexIndex.search(spark, root, Seq("vector", "merge"), k = 10)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("In(token"),
      s"term filter not pushed to the scan:\n$p")
  }

  test("rebuild publishes atomically: the old snapshot serves until the commit lands") {
    val root = freshIndex()
    val before = LexIndex.search(spark, root, Seq("vector"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    // rebuild over half the corpus — a reader holding the OLD version
    // is unaffected mid-build; after commit, a fresh search reflects it
    LexIndex.build(spark, docs.where(col("doc_id") % 2 === 0), root)
    val after = LexIndex.search(spark, root, Seq("vector"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(after.forall(_ % 2 == 0), s"rebuilt index still serves odd docs: $after")
    assert(before.exists(_ % 2 == 1), "fixture too weak: old top-5 all even")
  }

  test("hybrid is the exact integer RRF of its two input rankings") {
    val root = freshIndex()
    val emb = catalog.Catalog.embeddings(spark, sfDir)
    val fused = LexIndex.hybrid(spark, root, Seq("vector", "merge"),
      emb, queryVecId = 0L, k = 10, poolK = 20).collect()
    assert(fused.length == 10)
    fused.foreach { r =>
      val (lexR, vecR) = (Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]))
      val expect = lexR.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        vecR.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"RRF mismatch on row $r")
      assert(lexR.isDefined || vecR.isDefined)
    }
    // fused order is (rrf desc, doc_id)
    val scores = fused.map(r => (r.getLong(3), r.getLong(0)))
    assert(scores.toSeq == scores.sortBy { case (s, d) => (-s, d) }.toSeq)
  }

  test("incremental ingest equals a from-scratch rebuild row-for-row") {
    import org.apache.spark.sql.functions._
    val rootInc = Files.createTempDirectory("lex_inc_").toString
    val rootFull = Files.createTempDirectory("lex_full_").toString
    LexIndex.build(spark, docs.where(col("doc_id") % 3 =!= 0), rootInc)
    LexIndex.ingest(spark, docs.where(col("doc_id") % 3 === 0), rootInc)
    LexIndex.build(spark, docs, rootFull)
    for (terms <- Seq(Seq("vector"), Seq("vector", "merge", "spark"))) {
      val inc = LexIndex.search(spark, rootInc, terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val full = LexIndex.search(spark, rootFull, terms, k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(inc == full, s"terms=$terms: incremental diverged from rebuild")
    }
    // and a second ingest stacks another generation, still exact
    val rootInc2 = Files.createTempDirectory("lex_inc2_").toString
    LexIndex.build(spark, docs.where(col("doc_id") % 3 === 1), rootInc2)
    LexIndex.ingest(spark, docs.where(col("doc_id") % 3 === 2), rootInc2)
    LexIndex.ingest(spark, docs.where(col("doc_id") % 3 === 0), rootInc2)
    val inc2 = LexIndex.search(spark, rootInc2, Seq("vector", "merge"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val full2 = LexIndex.search(spark, rootFull, Seq("vector", "merge"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(inc2 == full2, "two stacked generations diverged from rebuild")
  }

  test("generation compaction is content-neutral: search byte-identical, manifest shrinks to one") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("lex_cpt_").toString
    LexIndex.build(spark, docs.where(col("doc_id") % 3 === 0), root)
    LexIndex.ingest(spark, docs.where(col("doc_id") % 3 === 1), root)
    LexIndex.ingest(spark, docs.where(col("doc_id") % 3 === 2), root)
    val terms = Seq("vector", "merge", "spark")
    val before = LexIndex.search(spark, root, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    val v = LexIndex.compactGenerations(spark, root)
    val manifest = spark.read.parquet(
      graft.streaming.StateCommit.tableDir(root, v, "manifest"))
      .collect().map(_.getLong(0)).toSeq
    assert(manifest == Seq(v), s"manifest not compacted: $manifest")
    val after = LexIndex.search(spark, root, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(after == before, "compaction changed search results")
  }
}
