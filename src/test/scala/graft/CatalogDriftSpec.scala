package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** Schema-drift guard contract for every driver-owned testdata table
  * (the generalization of [[CatalogEventsSpec]]'s events fix, round-8
  * verdict item #3): a regenerated parquet with an unexpected physical
  * type must fail with ONE clear message naming the table and the
  * drift — not scattered analysis errors downstream — while harmless
  * re-typings (integer/float widths, known timestamp vintages) read
  * through unguarded.
  */
class CatalogDriftSpec extends SparkSpec {
  import spark.implicits._

  private def dirWith(name: String)(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft_drift_$name").toString
    df.write.parquet(s"$dir/$name.parquet")
    dir
  }

  test("a wrong-typed column fails with one message naming table and drift") {
    val dir = dirWith("embeddings") {
      Seq((1L, "not-a-vector", 0)).toDF("vec_id", "embedding", "label")
    }
    val e = intercept[IllegalStateException](Catalog.embeddings(spark, dir))
    assert(e.getMessage.contains("'embeddings'"), e.getMessage)
    assert(e.getMessage.contains("embedding"), e.getMessage)
    assert(e.getMessage.contains("found string"), e.getMessage)
  }

  test("a missing column is named explicitly") {
    val dir = dirWith("documents") {
      Seq((1L, "text", "en")).toDF("doc_id", "text", "lang") // no source/n_chars
    }
    val e = intercept[IllegalStateException](Catalog.documents(spark, dir))
    assert(e.getMessage.contains("'documents'"), e.getMessage)
    assert(e.getMessage.contains("missing column: source"), e.getMessage)
    assert(e.getMessage.contains("missing column: n_chars"), e.getMessage)
  }

  test("an unknown events.ts vintage trips the guard, not a downstream analysis error") {
    val dir = dirWith("events") {
      Seq((1L, "2024-01-01", 1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    }
    val e = intercept[IllegalStateException](Catalog.events(spark, dir))
    assert(e.getMessage.contains("'events'"), e.getMessage)
    assert(e.getMessage.contains("ts"), e.getMessage)
  }

  test("harmless re-typings read through: widened ints, doubled floats") {
    val dir = dirWith("embeddings") {
      Seq((1, Seq(0.1d, 0.2d), 0L)).toDF("vec_id", "embedding", "label")
    }
    // int vec_id, array<double> embedding, bigint label — all accepted
    assert(Catalog.embeddings(spark, dir).count() == 1L)
  }

  test("extra columns are allowed (forward-compatible regeneration)") {
    val dir = dirWith("region") {
      Seq((0, "AFRICA", "new-col")).toDF("r_regionkey", "r_name", "r_comment")
    }
    assert(Catalog.region(spark, dir).count() == 1L)
  }

  test("every real testdata table passes its guard at the spec SF") {
    val readers: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> Catalog.region _, "nation" -> Catalog.nation _,
      "customer" -> Catalog.customer _, "supplier" -> Catalog.supplier _,
      "part" -> Catalog.part _, "orders" -> Catalog.orders _,
      "lineitem" -> Catalog.lineitem _, "events" -> Catalog.events _,
      "documents" -> Catalog.documents _, "embeddings" -> Catalog.embeddings _)
    readers.foreach { case (name, rd) =>
      assert(rd(spark, sfDir).columns.nonEmpty, s"$name guard failed")
    }
  }
}
