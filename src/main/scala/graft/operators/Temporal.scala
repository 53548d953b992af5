package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over the event stream.
  *
  * Spark has no native AS OF join; the naive encoding is an inequality
  * join (`s.ts <= t.ts`) whose physical plan is a per-key cartesian — a
  * scale-killer. The Spark-first shape used here is union-and-window:
  * tag both sides, sort once per key, and carry the latest source row
  * forward with `last(..., ignoreNulls)` over a trailing frame. ONE
  * shuffle on the key, linear per-partition scan, no pair explosion —
  * the same plan a 1000-executor cluster wants at 100 TB.
  */
object Temporal {

  /** As-of join (point-in-time attribution): for every `target` event,
    * the latest `source` event strictly preceding it (in (ts, event_id)
    * order) for the same user — the "purchase attributed to the last
    * click" query of a conversion pipeline, and the general
    * sensor-reading-as-of-measurement shape.
    *
    * Times are epoch MICROSECONDS as BIGINT (the engine's fixed-point
    * output contract); targets with no prior source carry NULLs. The
    * (ts, event_id) window order makes same-timestamp ties deterministic
    * on both engines.
    */
  def asofAttribution(events: DataFrame, target: String = "purchase",
      source: String = "click"): DataFrame = {
    val tagged = events
      .where(col("event_type").isin(target, source))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def lastSrc(c: org.apache.spark.sql.Column) =
      last(when(col("event_type") === source, c), ignoreNulls = true).over(w)
    tagged
      .withColumn("src_id", lastSrc(col("event_id")))
      .withColumn("src_ts_us", lastSrc(col("ts_us")))
      .where(col("event_type") === target)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("src_id"), col("src_ts_us"),
        (col("ts_us") - col("src_ts_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** Ordered event FUNNEL — the conversion analysis of an event
    * pipeline: how many users completed signup → click → purchase IN
    * ORDER (each step's first occurrence at or after the previous
    * step's). Returns one row per step with the surviving-user count
    * and the conversion rate vs step 1.
    *
    * Scale posture: each step is one combinable min-aggregation plus an
    * equi-join on user_id against the previous step's (user, ts) table —
    * never an inequality join; per-step tables shrink monotonically.
    * The summary is ONE job: per-step 1-row aggregates union into the
    * result instead of a per-step .count() action. */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      materialize: Boolean = true): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    // fold: step k's table = users whose first step-k event is >= their
    // step-(k-1) time; each step table snapshots (it feeds both its
    // count and the next step's join)
    val stepTables = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val mine = ev.where(col("event_type") === step)
        val reached = prev match {
          case None => mine
          case Some(p) =>
            mine.join(p.select(col("user_id"), col("t").as("prev_t")), Seq("user_id"))
              .where(col("us") >= col("prev_t"))
        }
        Some(Stage.snap(reached.groupBy("user_id").agg(min("us").as("t")),
          materialize))
    }.flatten
    // ONE job for the whole summary regardless of step count (was one
    // .count() action per step): each snapshotted step table contributes
    // a 1-row global aggregate, the union is steps.length rows, and the
    // step-1 denominator arrives via a running-first window — funnel
    // itself triggers no driver-side action beyond the stage snapshots.
    val stepRows = steps.zipWithIndex.zip(stepTables).map { case ((step, i), t) =>
      t.groupBy().agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"), col("n_users"))
    }.reduce(_.union(_))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("step")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    stepRows
      .withColumn("conversion",
        when(first(col("n_users")).over(w) === 0, lit(0.0))
          .otherwise(round(col("n_users") / first(col("n_users")).over(w), 4)))
      .orderBy("step")
  }

  /** Interval join (batch form of the streaming
    * [[graft.streaming.EventStream.attributionJoin]]): every (target,
    * source) pair of the same user with source inside
    * [target_ts − horizon, target_ts] — the all-qualifying-touchpoints
    * attribution, where [[asofAttribution]] keeps only the latest one.
    *
    * Scale posture: an EQUI-join on user_id with the interval as a
    * residual predicate — sort-merge/shuffled-hash on the key, never a
    * cartesian; per-key fan-out is bounded by horizon × event density,
    * the quantity the horizon knob controls. Epoch-micros BIGINT
    * output. */
  def intervalJoin(events: DataFrame, target: String = "purchase",
      source: String = "click", horizonMinutes: Int = 30): DataFrame = {
    val p = events.where(col("event_type") === target)
      .select(col("event_id").as("target_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
    val c = events.where(col("event_type") === source)
      .select(col("event_id").as("src_id"), col("user_id"),
        unix_micros(col("ts")).as("s_us"))
    p.join(c, Seq("user_id"))
      .where(col("s_us") <= col("t_us") &&
        col("s_us") >= col("t_us") - lit(horizonMinutes * 60000000L))
      .select(col("target_id"), col("user_id"), col("t_us"),
        col("src_id"), col("s_us"), (col("t_us") - col("s_us")).as("gap_us"))
      .orderBy("target_id", "src_id")
  }

  /** Cohort retention: users grouped by signup week, then the count of
    * cohort members still active `k` weeks later — the retention
    * triangle every growth dashboard draws, and the engagement-decay
    * curve a data-mixing pipeline weights refresh crawls by.
    *
    * Weeks are integer divisions of epoch MICROSECONDS (pure BIGINT
    * arithmetic — no calendar-week truncation, whose Monday/Sunday
    * convention differs across engines). Activity strictly before the
    * user's signup instant is excluded.
    *
    * Scale posture: the signup table reduces to one row per user before
    * anything joins it (broadcast-size for dim-like user counts,
    * shuffle equi-join beyond); the distinct-user count is the one
    * two-phase shuffle. `approxDistinct = true` IS the 100 TB path —
    * `approx_count_distinct` (HLL++, `rsd` standard error) replaces the
    * exact two-phase distinct with a fixed-size mergeable sketch per
    * (cohort, offset) group, so the shuffle carries sketches instead of
    * user ids (the ta_cardinality pairing; spec-bounded within 5% of
    * exact at sf0.1). Exact stays the default because it is what the
    * deterministic oracle gates. */
  def cohortRetention(events: DataFrame,
      weekMicros: Long = 604800000000L,
      materialize: Boolean = true,
      approxDistinct: Boolean = false,
      rsd: Double = 0.02): DataFrame = {
    // the signup table has two consumers (cohort sizes + the activity
    // join) — snapshot it once rather than re-running the scan+agg per
    // branch (the funnel/tfbg pattern)
    val coh = Stage.snap(
      events.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("es"))
        .withColumn("cohort_week", expr(s"es div ${weekMicros}L")),
      materialize)
    val size = coh.groupBy("cohort_week").agg(count(lit(1)).as("cohort_users"))
    events.select(col("user_id"), unix_micros(col("ts")).as("ea"))
      .join(coh, Seq("user_id"))
      .where(col("ea") >= col("es"))
      .select(col("cohort_week"),
        expr(s"(ea - es) div ${weekMicros}L").as("week_offset"), col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(
        (if (approxDistinct) approx_count_distinct(col("user_id"), rsd)
         else countDistinct(col("user_id"))).as("n_active"))
      .join(size, Seq("cohort_week"))
      .select("cohort_week", "week_offset", "n_active", "cohort_users")
      .orderBy("cohort_week", "week_offset")
  }

  /** Hourly event-rate anomaly score — the pipeline-health monitor a
    * production ingest runs: per event type, each hour's count against
    * the trailing `trailing` observed hourly buckets, as a z-score in
    * integer MILLI units. A crawler dying (z ≪ 0) or a spam flood
    * (z ≫ 0) shows up as |z_milli| ≳ 3000.
    *
    * Determinism contract: the window carries exact integer sums (Σn,
    * Σn²); mean/variance derive from them with ONE fixed expression tree
    * mirrored verbatim in the oracle, so the doubles are bit-identical
    * across engines before the final milli-round. Hours with an
    * incomplete trailing window, or zero variance, emit no score (NULL
    * keeps the row's count visible without inventing a z).
    *
    * Scale posture: one combinable (event_type, hour) count — the
    * hourly table is metadata-sized at any corpus scale — then a
    * per-type window over it. Nothing event-proportional shuffles past
    * the first aggregation. */
  def rateAnomaly(events: DataFrame, trailing: Int = 24): DataFrame =
    rateAnomalyFromHourly(hourlyOf(events), trailing)

  /** The (event_type, hour, n) pre-aggregation under [[rateAnomaly]] —
    * exposed so a streaming monitor can MAINTAIN it incrementally (counts
    * merge by sum) and re-score without the raw events.
    *
    * Buckets truncate via EPOCH MICROS, not `date_trunc` (round-11
    * review): date_trunc truncates in the session timezone, so a
    * non-UTC session's DST fall-back merged two UTC hours into one
    * bucket (a spurious 2× spike) and spring-forward left a phantom
    * gap — the resample operator's pure-epoch contract, now applied
    * here. The UTC-session values are identical (hour boundaries
    * coincide), so the DuckDB mirror is unchanged; only the final
    * display string still renders in the session timezone. */
  def hourlyOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        timestamp_micros(expr("unix_micros(ts) div 3600000000") *
          3600000000L).as("hour"))
      .agg(count(lit(1)).as("n"))

  /** Scoring half of [[rateAnomaly]]: the trailing window + z over an
    * (event_type, hour, n) table, whatever maintained it. */
  def rateAnomalyFromHourly(hourly: DataFrame, trailing: Int = 24): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(-trailing, -1)
    val t = lit(trailing.toDouble)
    // Σn² carries as DECIMAL(38,0), not BIGINT (round-11 review): at a
    // steady 1e9 events/hour a 24-bucket Σn² is 2.4e19 — past
    // Long.MaxValue — and the silent wrap turns variance negative,
    // blinding the monitor exactly when volume is highest. Decimal
    // keeps the sums exact (the determinism contract needs exact
    // integers feeding ONE shared double expression tree), and the
    // DuckDB mirror sums the same decimal type.
    val nDec = col("n").cast("decimal(19,0)")
    val scored = hourly
      .withColumn("s", sum("n").over(w))
      .withColumn("ss", sum(nDec * nDec).over(w))
      .withColumn("m", count(lit(1)).over(w))
      .where(col("m") === trailing)
    val sD = col("s").cast("double")
    // variance = (t·Σn² − (Σn)²) / t², with the NUMERATOR computed as an
    // exact decimal integer and cast to double ONCE: the naive
    // (Σn²_d − s_d·s/t)/t form cancels catastrophically at 1e9-scale
    // counts (variance 0.25 is below double resolution at 2.4e19), so
    // the monitor emitted no z precisely on high-volume types. The
    // DuckDB mirror computes the same exact integer via HUGEINT.
    val sDec = col("s").cast("decimal(19,0)")
    val variance = (lit(trailing).cast("decimal(19,0)") * col("ss") -
      sDec * sDec).cast("double") / (t * t)
    val z = round((col("n").cast("double") - sD / t) / sqrt(variance) * 1000)
      .cast("long")
    // Emitted contract (round-12 review): the DECIMAL arithmetic above is
    // internal only. `ss` emits as BIGINT (try_cast: null past Long.Max —
    // 10 orders of headroom at any gateable scale; the z is computed from
    // the exact decimal BEFORE the narrowing, so the monitor is never
    // blinded) per the rounds-2–4 driver-hash decimal contract: the
    // driver's hasher rejects small-row DECIMAL aggregate outputs even
    // when values match. `hour` emits as epoch-micros BIGINT: the old
    // date_format round-trip rendered through the SESSION timezone, so a
    // non-UTC driver session diverged from the oracle's naive truncation.
    scored.select(col("event_type"),
        unix_micros(col("hour")).as("hour"),
        col("n"), col("s"), expr("try_cast(ss AS BIGINT)").as("ss"),
        when(variance > 0, z).as("z_milli"))
      .orderBy("event_type", "hour")
  }

  /** Dense resample: bucket `tsCol` into fixed `stepMicros` bins per
    * `key` and FILL EVERY EMPTY BIN with explicit zeros across each
    * key's observed span — rate, anomaly and windowed-trend math needs
    * gaps as zeros, not missing rows ([[rateAnomalyFromHourly]]'s
    * trailing mean, for one, under-counts silently on sparse input).
    *
    * The grid generates from the AGGREGATED spans (key-cardinality
    * rows), row-locally via `sequence`/`explode` — never a cross join
    * against a global calendar, so span length bounds fan-out per key
    * and a 100 TB fact contributes one combinable aggregation. The agg
    * subtree feeds both the spans and the final join; Spark's exchange
    * reuse materializes it once. Buckets are epoch-micros BIGINTs (the
    * fixed-point contract), truncating division — exact on both
    * engines for the post-1970 domain.
    */
  def resample(events: DataFrame, key: String, tsCol: String,
      valueCol: String, stepMicros: Long = 3600000000L): DataFrame = {
    val bucketed = events.select(col(key),
      (expr(s"unix_micros($tsCol) div ${stepMicros}L") * stepMicros)
        .as("bucket_us"),
      col(valueCol))
    val agg = bucketed.groupBy(key, "bucket_us")
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total"))
    val spans = agg.groupBy(key)
      .agg(min("bucket_us").as("mn"), max("bucket_us").as("mx"))
    val grid = spans.select(col(key),
      explode(sequence(col("mn"), col("mx"), lit(stepMicros))).as("bucket_us"))
    grid.join(agg, Seq(key, "bucket_us"), "left")
      .select(col(key), col("bucket_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("total"), lit(0L)).as("total"))
  }
}
