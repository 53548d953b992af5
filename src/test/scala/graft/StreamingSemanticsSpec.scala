package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** Watermark and timeout semantics driven through real streaming
  * micro-batches: append-mode windows emit exactly once when the
  * watermark passes, events older than the watermark are dropped, and
  * the debounce flush fires only after a quiet period — behaviors the
  * batch-shaped oracle queries cannot exercise. Each phase runs a
  * Trigger.AvailableNow pass against a shared checkpoint (state persists
  * across restarts), the deterministic drive pattern for MemoryStream.
  */
class StreamingSemanticsSpec extends SparkSpec {

  import spark.implicits._

  private def runPhases(stream: DataFrame)(phases: (() => Unit)*): Seq[Seq[Row]] = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ck").toString
    phases.map { phase =>
      phase()
      val collected = scala.collection.mutable.ListBuffer.empty[Row]
      val q = stream.writeStream
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          collected.synchronized { collected ++= b.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      collected.toSeq
    }.toSeq
  }

  test("append-mode window emits once on watermark passage; late data dropped") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = input.toDF()
      .select(timestamp_seconds(col("_1")).as("ts"), col("_2").as("event_type"))
    val agg = EventStream.hourlyAppend(events, "1 hour")
    val h10 = 10L * 3600 // window [10:00, 11:00)

    val phases = runPhases(agg)(
      // burst inside the 10:00 window — must NOT emit yet
      () => input.addData((h10 + 60, "save"), (h10 + 120, "save")),
      // event time 13:00 -> watermark (1h lag) = 12:00 after this pass
      () => input.addData((13L * 3600, "save")),
      // next pass closes + emits the 10:00 window
      () => input.addData((13L * 3600 + 300, "save")),
      // a late event inside the closed window is DROPPED, not re-emitted
      () => input.addData((h10 + 600, "save")))

    def emitted(rows: Seq[Row]) =
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val all = phases.map(emitted)
    assert(all(0).isEmpty, "window emitted before watermark passed")
    // the closed window emits EXACTLY once (in whichever pass the
    // watermark advance lands), with the pre-watermark count of 2
    assert(all.flatten.filter(_._1 == "1970-01-01 10:00:00") ==
      Seq(("1970-01-01 10:00:00", "save", 2L)),
      s"window must emit exactly once with count 2: $all")
    assert(all(3).forall(_._1 != "1970-01-01 10:00:00"),
      s"late event must not re-emit the closed window: ${all(3)}")
  }

  test("dedupStream: replays within the watermark horizon are dropped, new keys pass") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (event_id, ts seconds)
    val events = input.toDF()
      .select(col("_1").as("event_id"), timestamp_seconds(col("_2")).as("ts"))
    val deduped = EventStream.dedupStream(events, "10 minutes")
    val t0 = 10L * 3600

    val phases = runPhases(deduped)(
      // same-batch replay: the key emits exactly once
      () => input.addData((1L, t0), (1L, t0 + 5)),
      // next batch: in-horizon replay of 1 is dropped; new key 2 passes
      () => input.addData((1L, t0 + 60), (2L, t0 + 60)))

    val ids = phases.map(_.map(_.getLong(0)).sorted)
    assert(ids(0) == Seq(1L), s"same-batch replay must collapse: $ids")
    assert(ids(1) == Seq(2L), s"in-horizon replay must be dropped: $ids")
  }

  test("debounceFlush: bursts stay silent until the event-time quiet period passes") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (parent_id, epoch seconds)
    val events = input.toDF()
      .select(col("_1").as("parent_id"), timestamp_seconds(col("_2")).as("ts"))
    val flushed = EventStream
      .debounceFlush(events, quietMs = 30000, watermarkDelay = "10 seconds")
      .toDF("parent_id", "n_events")

    val phases = runPhases(flushed)(
      // a burst of 3 variation saves for parent 7 at t=100..102s:
      // flush deadline = 132s, watermark = 92s -> NO refresh yet
      () => input.addData((7L, 100L), (7L, 101L), (7L, 102L)),
      // an event for another parent at t=150s advances the watermark to
      // 140s > 132s -> parent 7's quiet period has passed: flush (7, 3)
      () => input.addData((8L, 150L)),
      // t=250s -> watermark 240s > 180s -> parent 8 flushes too
      () => input.addData((9L, 250L)))

    def emitted(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getLong(1)))
    val all = phases.map(emitted)
    assert(all(0).isEmpty, s"burst must not flush before its quiet period: $all")
    assert(all.flatten.count(_ == (7L, 3L)) == 1 && all(0).isEmpty,
      s"parent 7 should flush exactly one 3-event refresh: $all")
    assert(all.flatten.contains((8L, 1L)), all.toString)
  }

  test("debounceFlush: well-separated bursts never merge, even if the timeout lagged") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("parent_id"), timestamp_seconds(col("_2")).as("ts"))
    val flushed = EventStream
      .debounceFlush(events, quietMs = 30000, watermarkDelay = "10 seconds")
      .toDF("parent_id", "n_events")

    val phases = runPhases(flushed)(
      // burst 1 for parent 7 (deadline 132s)
      () => input.addData((7L, 100L), (7L, 101L), (7L, 102L)),
      // burst 2 for the SAME parent at t=500s: the watermark (92s) hasn't
      // fired burst 1's timeout yet, but in event time its quiet period
      // long passed -> burst 1 must flush as its own (7, 3) refresh, not
      // merge into burst 2
      () => input.addData((7L, 500L)),
      // t=600s -> watermark 590s > 530s -> burst 2 flushes separately
      () => input.addData((9L, 600L)))

    def emitted(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getLong(1)))
    val all = phases.map(emitted)
    assert(all(1).contains((7L, 3L)),
      s"stale burst must flush when a later burst arrives: $all")
    assert(all(2).contains((7L, 1L)),
      s"the second burst must flush on its own: $all")
    assert(all.flatten.count(_._1 == 7L) == 2, all.toString)
  }

  test("debounceFlush: separated bursts in ONE micro-batch stay separate") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("parent_id"), timestamp_seconds(col("_2")).as("ts"))
    val flushed = EventStream
      .debounceFlush(events, quietMs = 30000, watermarkDelay = "10 seconds")
      .toDF("parent_id", "n_events")

    val phases = runPhases(flushed)(
      // catch-up replay: one batch carries bursts at t=100..102s AND
      // t=500s for the same parent (gap 398s >> 30s quiet period)
      () => input.addData((7L, 100L), (7L, 101L), (7L, 102L), (7L, 500L)),
      // watermark to 590s -> the trailing single-event burst flushes too
      () => input.addData((9L, 600L)))

    def emitted(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getLong(1)))
    val all = phases.map(emitted)
    assert(all(0).contains((7L, 3L)),
      s"first burst must flush on segmentation within the batch: $all")
    assert(all(1).contains((7L, 1L)),
      s"trailing burst must flush separately: $all")
    assert(!all.flatten.contains((7L, 4L)), s"bursts merged: $all")
  }

  test("stream-stream interval join pairs purchases with in-horizon clicks only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Long)]
    val purchases = MemoryStream[(Long, Long, Long)]
    def asEvents(m: MemoryStream[(Long, Long, Long)]) = m.toDF()
      .select(col("_1").as("event_id"), col("_2").as("user_id"),
        timestamp_seconds(col("_3")).as("ts"))
    val joined = EventStream.attributionJoin(
      asEvents(clicks), asEvents(purchases), horizon = "5 minutes")

    val phases = runPhases(joined)(
      // user 1 purchase at t=1000: click 1 (t=700, inside the 300 s
      // horizon) matches; click 2 (t=500, 500 s before) and click 3
      // (other user) must not
      () => {
        clicks.addData((1L, 1L, 700L), (2L, 1L, 500L), (3L, 2L, 900L))
        purchases.addData((10L, 1L, 1000L))
      },
      // a click arriving in a LATER batch with ts == purchase ts still
      // joins against the buffered purchase state (<= bound)
      () => clicks.addData((4L, 1L, 1000L)))

    def pairs(rows: Seq[Row]) = rows.map(r => (r.getLong(0), r.getLong(3)))
    val all = phases.map(pairs)
    assert(all(0).toSet == Set((10L, 1L)), s"phase 1: $all")
    assert(all(1).toSet == Set((10L, 4L)), s"phase 2 (buffered state): $all")
  }
}
