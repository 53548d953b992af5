package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.catalog.Catalog

/** `Catalog.events` schema-drift contract: the driver has regenerated
  * `events.parquet` with different physical `ts` encodings across rounds
  * (INT64 nanos read as LongType under the legacy conf; TIMESTAMP_MICROS
  * with isAdjustedToUTC=false, inferred TIMESTAMP_NTZ by Spark 4) — and
  * one hard-coded assumption about the encoding once took out all 14
  * events-sourced queries. This spec pins: whatever the vintage, the
  * catalog yields the SAME session-zoned TimestampType `ts` with the
  * same instants, so every downstream operator (`unix_micros`, windows,
  * watermarks) keeps working unmodified.
  */
class CatalogEventsSpec extends SparkSpec {
  import spark.implicits._

  // one event at 2024-03-01T06:30:15.123456Z, one at the epoch hour
  private val micros = Seq(1709274615123456L, 3600000000L)

  private def writeVintage(kind: String): String = {
    val dir = Files.createTempDirectory(s"graft_events_$kind").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "click", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val df = kind match {
      case "nanos_long" => // INT64 nanos, the pre-r7 encoding
        base.withColumn("ts", col("us") * 1000L)
      case "ntz_micros" => // unadjusted TIMESTAMP(MICROS) -> read as NTZ
        base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      case "ltz_micros" => // UTC-adjusted micros -> read as TimestampType
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").write.parquet(s"$dir/events.parquet")
    dir
  }

  test("all ts vintages normalize to the same session-zoned timestamps") {
    val vintages = Seq("nanos_long", "ntz_micros", "ltz_micros")
    for (kind <- vintages) {
      val ev = Catalog.events(spark, writeVintage(kind))
      assert(ev.schema("ts").dataType == TimestampType,
        s"$kind: ts is ${ev.schema("ts").dataType}")
      val got = ev.select(unix_micros(col("ts"))).orderBy("event_id")
        .as[Long].collect().toSeq
      assert(got == micros, s"$kind: instants drifted: $got")
    }
  }

  test("the real testdata reads through every temporal entry point") {
    val ev = Catalog.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    // unix_micros is the strictest consumer (rejects NTZ outright)
    assert(ev.select(min(unix_micros(col("ts")))).head.getLong(0) > 0L)
  }
}
