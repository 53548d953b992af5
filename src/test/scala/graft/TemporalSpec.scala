package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** As-of join semantics: each target event attributes to the latest
  * source event preceding it in (ts, event_id) order, per key; targets
  * with no prior source carry NULLs; unrelated event types are ignored.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, typ: String) =
    (id, user, t, typ)

  private lazy val events = Seq(
    // user 1: interleaved clicks and purchases
    ev(1, 1, "2024-01-01 10:00:00", "click"),
    ev(4, 1, "2024-01-01 10:02:00", "purchase"),
    ev(2, 1, "2024-01-01 10:05:00", "click"),
    ev(9, 1, "2024-01-01 10:06:00", "view"), // ignored type
    ev(3, 1, "2024-01-01 10:07:00", "purchase"),
    // user 2: purchase with no prior click
    ev(7, 2, "2024-01-01 09:00:00", "purchase"),
    ev(8, 2, "2024-01-01 09:30:00", "click"),
    // user 3: click and purchase at the SAME timestamp — the smaller
    // event_id (the click) precedes in (ts, event_id) order
    ev(5, 3, "2024-01-01 11:00:00", "click"),
    ev(6, 3, "2024-01-01 11:00:00", "purchase"))
    .toDF("event_id", "user_id", "t", "event_type")
    .select(col("event_id"), col("user_id"),
      to_timestamp(col("t")).as("ts"), col("event_type"))

  test("purchases attribute to the latest prior click per user") {
    val rows = Temporal.asofAttribution(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    // purchase 4 (10:02) ← click 1 (10:00), gap 120 s
    assert(rows(4L).getLong(3) == 1L, rows(4L).toString)
    assert(rows(4L).getLong(5) == 120L * 1000000L, rows(4L).toString)
    // purchase 3 (10:07) ← click 2 (10:05), NOT the older click 1
    assert(rows(3L).getLong(3) == 2L, rows(3L).toString)
    assert(rows(3L).getLong(5) == 120L * 1000000L, rows(3L).toString)
  }

  test("no prior source -> NULL attribution; later clicks don't leak back") {
    val rows = Temporal.asofAttribution(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(7L).isNullAt(3) && rows(7L).isNullAt(4) && rows(7L).isNullAt(5),
      rows(7L).toString)
  }

  test("same-timestamp tie: smaller event_id precedes deterministically") {
    val rows = Temporal.asofAttribution(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(6L).getLong(3) == 5L, rows(6L).toString)
    assert(rows(6L).getLong(5) == 0L, rows(6L).toString)
  }

  test("funnel: steps count only in order; out-of-order purchases drop") {
    // user 1: signup -> click -> purchase (full conversion)
    // user 2: signup -> purchase -> click (purchase precedes the click,
    //          so step 3 must NOT count it; the click still counts)
    // user 3: click + purchase but NO signup — never enters the funnel
    val ev = Seq(
      (11L, 1L, "2024-01-01 09:00:00", "signup"),
      (12L, 1L, "2024-01-01 09:10:00", "click"),
      (13L, 1L, "2024-01-01 09:20:00", "purchase"),
      (21L, 2L, "2024-01-01 09:00:00", "signup"),
      (22L, 2L, "2024-01-01 09:10:00", "purchase"),
      (23L, 2L, "2024-01-01 09:20:00", "click"),
      (31L, 3L, "2024-01-01 09:00:00", "click"),
      (32L, 3L, "2024-01-01 09:10:00", "purchase"))
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val rows = Temporal.funnel(ev).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1) == ((2L, 1.0)), rows.toString)
    assert(rows(2) == ((2L, 1.0)), rows.toString)
    assert(rows(3) == ((1L, 0.5)), rows.toString)
  }

  test("only target rows are emitted; sources and other types are not") {
    val ids = Temporal.asofAttribution(events).collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L, 4L, 6L, 7L), ids.toString)
  }

  test("funnel is lazy: construction triggers no Spark job (one-action summary)") {
    // round 5 ran one .count() action per step on the driver; the
    // summary is now a union of per-step 1-row aggregates, so with
    // materialize=false (no stage snapshots) building the DataFrame
    // must not run ANY job — the caller's single action does all work
    val ev = Seq((11L, 1L, "2024-01-01 09:00:00", "signup"))
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Temporal.funnel(ev, materialize = false)
      Thread.sleep(500) // listener bus is async; give events time to land
      assert(jobs == 0, s"funnel construction ran $jobs job(s)")
      assert(df.collect().length == 3)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("cohort retention: signup-week cohorts, offsets, pre-signup excluded") {
    val wk = 604800L // seconds
    val feed = Seq(
      // user 1 signs up mid-week 0, active again in week-offset 1
      (1L, 1L, 100L, "signup"), (2L, 1L, 200L, "click"),
      (3L, 1L, 100L + wk, "view"),
      // user 1 pre-signup activity must NOT count (would be offset < 0)
      (4L, 1L, 50L, "click"),
      // user 2 signs up week 0, never returns
      (5L, 2L, 300L, "signup"),
      // user 3 signs up week 1, active weeks 1 and 2
      (6L, 3L, wk + 10L, "signup"), (7L, 3L, 2 * wk + 10L, "purchase"),
      // user 4 never signs up — excluded entirely
      (8L, 4L, 400L, "click"))
      .toDF("event_id", "user_id", "s", "event_type")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("s")).as("ts"), col("event_type"))
    val got = Temporal.cohortRetention(feed).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      (0L, 0L) -> (2L, 2L), // both week-0 users active at signup instant
      (0L, 1L) -> (1L, 2L), // only user 1 returns
      (1L, 0L) -> (1L, 1L),
      (1L, 1L) -> (1L, 1L)), got.toString)
  }

  // 25 hourly buckets of event type `t`: counts per hour from `counts`
  private def hourlyFeed(counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h.toLong * 3600 + i, "t"))
    }.toDF("s", "event_type")
      .select(timestamp_seconds(col("s")).as("ts"), col("event_type"))

  test("rate anomaly: hand-computed z over an alternating baseline; no score before a full window") {
    // hours 0..23 alternate 1,2 (mean 1.5, var 0.25); hour 24 spikes to 5
    val counts = (0 until 24).map(h => 1 + h % 2) :+ 5
    val got = Temporal.rateAnomaly(hourlyFeed(counts)).collect()
    // only hour 24 carries 24 trailing buckets
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 5 && r.getLong(3) == 36 && r.getLong(4) == 60)
    // round-12: hour emits as epoch-micros BIGINT (session-tz-proof);
    // hour 24 of the feed = 24*3600 s
    assert(r.getLong(1) == 24L * 3600 * 1000000L, r.toString)
    // z = (5 - 1.5) / 0.5 * 1000 — exact in doubles
    assert(r.getLong(5) == 7000, r.toString)
  }

  test("rate anomaly: zero-variance baseline emits the count but no z") {
    val counts = Seq.fill(24)(2) :+ 7
    val got = Temporal.rateAnomaly(hourlyFeed(counts)).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 7 && got.head.isNullAt(5), got.head.toString)
  }

  test("rate anomaly: Σn² at 1e9 events/hour stays exact — no silent BIGINT wrap blinding the monitor") {
    // round-11 review: 24 trailing buckets of n ≈ 1e9 give Σn² ≈ 2.4e19,
    // past Long.MaxValue — the old BIGINT sum wrapped negative, variance
    // went negative, and the `variance > 0` guard suppressed every z
    // exactly when volume was highest. Decimal sums stay exact.
    val big = (0 until 24).map(h => 1000000000L + (h % 2)) :+ 1000000100L
    val hourly = big.zipWithIndex.map { case (n, h) =>
      (s"2024-01-0${1 + h / 24} ${"%02d".format(h % 24)}:00:00", "e", n)
    }.toDF("t", "event_type", "n")
      .select(col("event_type"), col("t").cast("timestamp").as("hour"), col("n"))
    val got = Temporal.rateAnomalyFromHourly(hourly).collect()
    assert(got.length == 1)
    val r = got.head
    // round-12: the INTERNAL Σn² stays exact decimal (the z below is only
    // 199000 if it did not wrap), but the EMITTED ss narrows to BIGINT per
    // the driver-hash decimal contract — past Long.MaxValue the try_cast
    // discloses saturation as NULL instead of wrapping negative.
    assert(r.isNullAt(4),
      s"Σn² past Long.MaxValue must emit NULL ss, got ${r.get(4)}")
    // baseline alternates 1e9/1e9+1 (var 0.25, mean 1e9+0.5); the spike
    // of +99.5 over the mean scores z = 99.5/0.5*1000 = 199000 exactly —
    // ONLY if the internal sums never wrapped
    assert(!r.isNullAt(5), "overflow-free variance must emit a z")
    assert(r.getLong(5) == 199000L, r.toString)
  }

  test("hourly buckets are session-timezone independent: DST fall-back never merges two UTC hours") {
    // round-11 review: date_trunc('hour') truncates in the session tz, so
    // America/New_York's 2025-11-02 fall-back mapped 05:30Z and 06:30Z to
    // the same local 01:00 wall hour — one bucket with 2x the true count.
    // Epoch-micros truncation keeps them distinct in ANY session tz.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val events = Seq(
        "2025-11-02 05:30:00Z", "2025-11-02 05:45:00Z", // 05:00 UTC hour
        "2025-11-02 06:30:00Z"                           // 06:00 UTC hour
      ).toDF("t")
        .select(lit("e").as("event_type"),
          to_timestamp(col("t"), "yyyy-MM-dd HH:mm:ssX").as("ts"))
      val buckets = Temporal.hourlyOf(events)
        .select(unix_micros(col("hour")).as("us"), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val h0 = 1762059600L * 1000000L // 2025-11-02 05:00:00Z
      assert(buckets == Seq((h0, 2L), (h0 + 3600000000L, 1L)),
        s"DST fall-back merged UTC hours: $buckets")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("resample: gaps zero-fill, spans are per-key, mass is conserved") {
    val sparse = Seq(
      ("a", "2024-01-01 10:10:00", 5L),
      ("a", "2024-01-01 13:50:00", 7L),  // 2-hour gap at 11:00 and 12:00
      ("b", "2024-01-01 00:30:00", 1L),
      ("b", "2024-01-01 00:45:00", 2L)   // single bucket, no gap
    ).toDF("k", "t", "v").withColumn("ts", col("t").cast("timestamp"))
    val got = Temporal.resample(sparse, "k", "ts", "v")
      .orderBy("k", "bucket_us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val hour = 3600000000L
    val a = got.filter(_._1 == "a")
    assert(a.length == 4, s"a span should cover 10:00..13:00: ${a.mkString(", ")}")
    assert(a.map(_._3).toSeq == Seq(1L, 0L, 0L, 1L), "gap hours must be explicit zeros")
    assert(a.map(_._4).toSeq == Seq(5L, 0L, 0L, 7L))
    assert(a.sliding(2).forall(p => p(1)._2 - p(0)._2 == hour), "grid must be contiguous")

    val b = got.filter(_._1 == "b")
    assert(b.length == 1 && b.head._3 == 2 && b.head._4 == 3,
      s"b collapses to one bucket: ${b.mkString(", ")}")

    // mass conservation: resampled totals equal the raw totals
    assert(got.map(_._4).sum == 15L && got.map(_._3).sum == 4L)
  }
}
