package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Batch time windows over `events.ts` (SURVEY.md §2.7): tumbling, sliding
  * and session windows via the built-in `window` / `session_window`
  * generators. The identical expressions are Structured-Streaming-ready —
  * swap the batch read for `readStream` + `withWatermark` and the plans
  * carry over (the reference itself is strictly daily batch, so batch-first
  * is the faithful default).
  *
  * Money-ish doubles go through DECIMAL(12,2) like Relational (exact,
  * order-independent sums). All window boundaries are exact timestamp
  * arithmetic — events.ts is microsecond-aligned (Tables.events).
  */
object EventWindows {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def d2(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  /** The tumbling aggregation as a mode-agnostic transform: applied to a
    * batch read below, and to a watermarked `readStream` in
    * graft.streaming.EventStreams — the SAME declarative plan drives both
    * execution modes (proven equivalent in StreamingSpec).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), d2(sum(dec(col("value")))).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session aggregation as a mode-agnostic transform (see tumblingAgg). */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), d2(sum(dec(col("value")))).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  // ---------------------------------------------------------------------
  // EV1 tumbling window: 1-hour buckets per event_type. One shuffle on
  // (bucket, type) with partial aggregation — the scale-canonical shape.
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tumblingAgg(Tables.events(spark, dir))
      .orderBy($"window_start", $"event_type")
  }

  val tumblingSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // EV2 sliding window: 1-hour windows every 30 minutes — each event lands
  // in exactly 2 windows (Spark's `window(ts, len, slide)` generator; the
  // oracle reproduces it as bucket-minus-offset). Scale note: slide
  // duplication factor = len/slide; keep it small or pre-aggregate to the
  // slide grain and roll up (the 2-level approach) when len >> slide.
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), d2(sum(dec($"value"))).as("sum_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"window_start", $"event_type")
  }

  val slidingSql: String =
    """SELECT time_bucket(INTERVAL '30 minutes', ts) - o.off * INTERVAL '30 minutes' AS window_start,
      |  event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events CROSS JOIN (VALUES (0), (1)) o(off)
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // ---------------------------------------------------------------------
  // EV3 session window: per-user sessions closed by a 10-minute gap.
  // Spark's session_window merges events whose [ts, ts+gap) intervals
  // overlap, so a gap of EXACTLY 10 minutes starts a new session — the
  // oracle's break condition is therefore `>= gap`, not `> gap`.
  // 100 TB: one shuffle on user_id; state per key is bounded by the gap.
  def session(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionAgg(Tables.events(spark, dir))
      .orderBy($"user_id", $"session_start")
  }

  val sessionSql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '10 minutes'
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, MIN(ts) AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // ---------------------------------------------------------------------
  // EV4 funnel: ordered view → click → purchase conversion. One aggregation
  // collapses each user to first-step timestamps (map-side partial, single
  // shuffle on user_id), then one global roll-up — no self-joins, no
  // windows; at scale this is the cheapest funnel shape there is.
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "view", $"ts")).as("t_view"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when($"t_view".isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when($"t_view".isNotNull && $"t_click" > $"t_view", 1L).otherwise(0L)).as("n_clicked_after_view"),
        sum(when($"t_view".isNotNull && $"t_click" > $"t_view" && $"t_purchase" > $"t_click", 1L)
          .otherwise(0L)).as("n_full_funnel"))
  }

  val funnelSql: String =
    """WITH per AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
      |  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM per""".stripMargin

  // ---------------------------------------------------------------------
  // EV5 cohort retention: users bucketed by first-activity week, retention
  // = distinct activity in week k after the cohort week. The cohort frame
  // is node-sized (one row per user) and joins back on user_id — the same
  // single-shuffle shape as the funnel; week arithmetic is integer days/7
  // so both engines agree exactly.
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val cohorts = ev.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).cast("date").as("cohort_week"))
    ev.join(cohorts, Seq("user_id"))
      .withColumn("week_n",
        (datediff($"ts".cast("date"), $"cohort_week") / 7).cast("long"))
      .groupBy($"cohort_week")
      .agg(
        countDistinct($"user_id").as("n_users"),
        countDistinct(when($"week_n" === 1L, $"user_id")).as("n_week1"),
        countDistinct(when($"week_n" === 2L, $"user_id")).as("n_week2"),
        countDistinct(when($"week_n" >= 3L, $"user_id")).as("n_week3plus"))
      .orderBy($"cohort_week")
  }

  val retentionSql: String =
    """WITH cohorts AS (
      |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |j AS (
      |  SELECT e.user_id, c.cohort_week,
      |    date_diff('day', c.cohort_week, CAST(e.ts AS DATE)) // 7 AS week_n
      |  FROM events e JOIN cohorts c ON e.user_id = c.user_id)
      |SELECT cohort_week,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT CASE WHEN week_n = 1 THEN user_id END) AS n_week1,
      |  COUNT(DISTINCT CASE WHEN week_n = 2 THEN user_id END) AS n_week2,
      |  COUNT(DISTINCT CASE WHEN week_n >= 3 THEN user_id END) AS n_week3plus
      |FROM j GROUP BY cohort_week ORDER BY cohort_week""".stripMargin

  // ---------------------------------------------------------------------
  // W5 gap-fill: forward/backward fill of a sparse measure via IGNORE
  // NULLS running windows — the sensor/telemetry repair shape (the
  // reference's weather series has exactly this gap structure when a
  // parameter is missing for an interval). 'view' events stand in for the
  // gaps. last(ignoreNulls) over an unbounded-preceding ROWS frame is a
  // single running pass per partition — no self-join, no explode.
  // Ordering inside the window is (ts) which is unique per user at
  // microsecond grain in this dataset; output order is the total
  // event_id. 100 TB: one shuffle on user_id, running frames stream.
  def gapfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("v",
        when($"event_type" === "view", lit(null).cast("double")).otherwise($"value"))
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
      .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ev.select($"event_id", $"user_id", $"v".as("value_raw"),
        last($"v", ignoreNulls = true).over(wf).as("ffill"),
        first($"v", ignoreNulls = true).over(wb).as("bfill"))
      .withColumn("filled", coalesce($"ffill", $"bfill"))
      .orderBy($"event_id")
  }

  val gapfillSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, v AS value_raw,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
      |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
      |  FROM e)
      |SELECT event_id, user_id, value_raw, ffill, bfill,
      |  COALESCE(ffill, bfill) AS filled
      |FROM w ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // W7 EWMA: exponentially-weighted moving average per user, the smoothing
  // primitive of monitoring/trend pipelines. The recursion s_i = α·x_i +
  // (1−α)·s_{i−1} is not window-expressible directly, so each row collects
  // its bounded 16-row frame and folds it LEFT-TO-RIGHT (seed = oldest
  // frame value) with a sequential higher-order aggregate — identical fold
  // order in both engines, so the doubles match bit-for-bit before the
  // 6dp round. The 16-row truncation is principled, not a dodge: (1−α)^16
  // ≈ 1% at α=0.25, below the output rounding — and it's what makes the
  // operator scale-safe (an unbounded collected frame grows with history;
  // the bounded frame is 16 doubles per row regardless of SF).
  // Values flow as exact cents cast to double (integers are FP-exact).
  // 100 TB: one shuffle on user_id, then a running 16-slot frame per
  // partition — the same cost shape as any bounded moving average.
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-15, 0)
    Tables.events(spark, dir)
      .withColumn("xc", expr("CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)"))
      .withColumn("frame", collect_list($"xc").over(w))
      .withColumn("ewma_cents", expr(
        "aggregate(slice(frame, 2, size(frame) - 1), frame[0], (acc, x) -> 0.25d * x + 0.75d * acc)"))
      // explicit floor(+0.5) rounding: builtin round() half-way conventions
      // differ between engines exactly when the fold lands on a 5e-7
      // boundary (the E4 quantization lesson); values are non-negative
      .select($"user_id", $"event_id", $"value",
        expr("floor(ewma_cents / 100.0d * 1000000.0d + 0.5d) / 1000000.0d").as("ewma"))
      .orderBy($"user_id", $"event_id")
  }

  val ewmaSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS xc
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, value,
      |    list(xc) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS frame
      |  FROM e)
      |SELECT user_id, event_id, value,
      |  floor(list_reduce(frame, (acc, x) -> 0.25 * x + 0.75 * acc) / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS ewma
      |FROM f ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------------
  // W8 sequential pattern match (the MATCH_RECOGNIZE / gaps-and-islands
  // family): longest run of strictly-increasing order totals per customer.
  // The island id is the classic lag→break-flag→running-sum construction —
  // fully streaming inside one window partition, no self-join, no
  // iteration. Determinism: the sequence order is (o_orderdate,
  // o_orderkey) — a total order — and the final top-25 breaks ties on
  // customer id.
  // 100 TB: ONE shuffle on o_custkey; the lag, the running sum, and both
  // group-bys reuse that partitioning (Exchange reuse), and the top-25 is
  // a TakeOrderedAndProject (map-side partial top-k), never a global sort.
  def streak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wRun = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .withColumn("prev", lag($"o_totalprice", 1).over(w))
      .withColumn("brk", when($"prev".isNull || $"prev" >= $"o_totalprice", 1).otherwise(0))
      .withColumn("grp", sum($"brk").over(wRun))
      .groupBy($"o_custkey", $"grp").agg(count(lit(1)).as("run_len"))
      .groupBy($"o_custkey")
      .agg(max($"run_len").as("best_streak"), sum($"run_len").as("n_orders"))
      .orderBy($"best_streak".desc, $"o_custkey".asc)
      .limit(25)
  }

  val streakSql: String =
    """WITH f AS (
      |  SELECT o_custkey,
      |    CASE WHEN lag(o_totalprice, 1) OVER w IS NULL
      |           OR lag(o_totalprice, 1) OVER w >= o_totalprice
      |         THEN 1 ELSE 0 END AS brk,
      |    ROW_NUMBER() OVER w AS rn
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |runs AS (
      |  SELECT o_custkey,
      |    SUM(brk) OVER (PARTITION BY o_custkey ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM f),
      |x AS (SELECT o_custkey, grp, COUNT(*) AS run_len FROM runs GROUP BY 1, 2)
      |SELECT o_custkey, MAX(run_len) AS best_streak, CAST(SUM(run_len) AS BIGINT) AS n_orders
      |FROM x GROUP BY o_custkey
      |ORDER BY best_streak DESC, o_custkey ASC
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // W10 linear time-weighted interpolation (the missing member of the W5
  // gapfill family — pandas interpolate(method='time')): a null point
  // takes v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev) from
  // its nearest non-null neighbors in event time; leading/trailing gaps
  // degrade to bfill/ffill. Each neighbor is carried as ONE ignoreNulls
  // window struct (timestamp + value together — two scalar windows could
  // pair a value with the wrong timestamp), so the whole operator is two
  // window passes, same cost shape as W5.
  // Determinism: values ride exact integer cents and timestamps exact
  // micros; the only float ops are one division, one multiply, one add in
  // a fixed order, then the 6dp round.
  // 100 TB: one shuffle on user_id shared by both frames; no joins.
  def interpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("t", unix_micros($"ts"))
      .withColumn("vc",
        when($"event_type" === "view", lit(null).cast("bigint"))
          .otherwise(expr("CAST(round(value * 100) AS BIGINT)")))
    val wPast = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wNext = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"event_id")
      .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ev.select($"event_id", $"user_id", $"t", $"vc",
        last(when($"vc".isNotNull, struct($"t".as("pt"), $"vc".as("pv"))), ignoreNulls = true)
          .over(wPast).as("p"),
        first(when($"vc".isNotNull, struct($"t".as("nt"), $"vc".as("nv"))), ignoreNulls = true)
          .over(wNext).as("n"))
      .withColumn("interp_c",
        when($"vc".isNotNull, $"vc".cast("double"))
          .when($"p".isNull && $"n".isNull, lit(null).cast("double"))
          .when($"p".isNull, $"n.nv".cast("double"))
          .when($"n".isNull, $"p.pv".cast("double"))
          .otherwise($"p.pv" + ($"n.nv" - $"p.pv").cast("double")
            * (($"t" - $"p.pt").cast("double") / ($"n.nt" - $"p.pt"))))
      .select($"event_id", $"user_id",
        ($"vc" / 100.0).as("value_raw"),
        round($"interp_c" / 100.0, 6).as("interp"))
      .orderBy($"event_id")
  }

  val interpolateSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS t,
      |    CASE WHEN event_type = 'view' THEN NULL
      |         ELSE CAST(round(value * 100) AS BIGINT) END AS vc
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, t, vc,
      |    last_value(CASE WHEN vc IS NOT NULL THEN struct_pack(pt := t, pv := vc) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p,
      |    first_value(CASE WHEN vc IS NOT NULL THEN struct_pack(nt := t, nv := vc) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY t, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n
      |  FROM e),
      |x AS (
      |  SELECT event_id, user_id, vc,
      |    CASE WHEN vc IS NOT NULL THEN CAST(vc AS DOUBLE)
      |         WHEN p IS NULL AND n IS NULL THEN NULL
      |         WHEN p IS NULL THEN CAST(n.nv AS DOUBLE)
      |         WHEN n IS NULL THEN CAST(p.pv AS DOUBLE)
      |         ELSE p.pv + CAST(n.nv - p.pv AS DOUBLE)
      |           * (CAST(t - p.pt AS DOUBLE) / (n.nt - p.pt)) END AS interp_c
      |  FROM w)
      |SELECT event_id, user_id, vc / 100.0 AS value_raw,
      |  round(interp_c / 100.0, 6) AS interp
      |FROM x ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------------
  // W9 seasonal decomposition (the classical additive trend/seasonal/
  // residual split of monitoring and forecasting pipelines): the event
  // stream rolls up to an hourly revenue series, trend is a trailing
  // 24-hour moving average, the seasonal component is the hour-of-day
  // mean of the detrended series, and the residual is what remains —
  // value = trend + seasonal + resid (up to the component rounding).
  // Determinism: hourly cents are exact int64 sums; trend is
  // exact-sum/count (a ≤24-element sum of cents stays under 2^53, so
  // both engines divide identical exact values); the seasonal mean does
  // NOT average raw doubles — each detrended deviation is scaled to
  // integer nanodollars with the explicit floor(+0.5) rule and summed as
  // exact int64, because a float mean over an unordered group re-sums in
  // a different order on every RUN (observed: a one-in-N boundary flip
  // at sf0.001), not just across engines; resid is computed FROM THE
  // ROUNDED components, so it is exact given them.
  // 100 TB: the roll-up is one shuffle that REDUCES the corpus to a
  // time-bounded series (one row per hour — 10 years ≈ 88 k rows), so
  // the single-partition ordered window that follows runs on a bounded
  // input by construction, never on raw-data volume; the hour-of-day
  // seasonal pass reuses the same tiny series.
  def seasonalDecomp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
    val wTrend = org.apache.spark.sql.expressions.Window
      .orderBy($"hr").rowsBetween(-23, 0)
    val wHod = org.apache.spark.sql.expressions.Window.partitionBy(hour($"hr"))
    hourly
      .withColumn("trend_c", avg($"cents").over(wTrend))
      .withColumn("dev_e9", expr(
        "CAST(floor((cents - trend_c) / 100.0d * 1000000000.0d + 0.5d) AS BIGINT)"))
      .withColumn("seasonal", round(
        (sum($"dev_e9").over(wHod).cast("double") / count(lit(1)).over(wHod))
          / lit(1e9), 6))
      .withColumn("amount", round($"cents" / 100.0, 6))
      .withColumn("trend", round($"trend_c" / 100.0, 6))
      .withColumn("resid", round($"amount" - $"trend" - $"seasonal", 6))
      .select($"hr", $"n_events", $"amount", $"trend", $"seasonal", $"resid")
      .orderBy($"hr")
  }

  val seasonalDecompSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n_events,
      |    SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT hr, n_events, cents,
      |    AVG(cents) OVER (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS trend_c
      |  FROM hourly),
      |d AS (
      |  SELECT hr, n_events, cents, trend_c,
      |    CAST(floor((cents - trend_c) / 100.0 * 1000000000.0 + 0.5) AS BIGINT) AS dev_e9
      |  FROM t),
      |s AS (
      |  SELECT hr, n_events, cents, trend_c,
      |    round((CAST(SUM(dev_e9) OVER (PARTITION BY hour(hr)) AS DOUBLE)
      |           / COUNT(*) OVER (PARTITION BY hour(hr))) / 1000000000.0, 6) AS seasonal
      |  FROM d),
      |f AS (
      |  SELECT hr, n_events, round(cents / 100.0, 6) AS amount,
      |    round(trend_c / 100.0, 6) AS trend, seasonal
      |  FROM s)
      |SELECT hr, n_events, amount, trend, seasonal,
      |  round(amount - trend - seasonal, 6) AS resid
      |FROM f ORDER BY hr""".stripMargin

  // ---------------------------------------------------------------------
  // EV6 sliding distinct users: unique-actor counts per sliding window —
  // THE streaming product metric (DAU/WAU shape). Written as the explicit
  // two-phase form: dedupe (window, user) first (one shuffle whose
  // partial aggregation collapses repeat actors map-side), then a
  // window-sized count — the scalable expansion of COUNT(DISTINCT), kept
  // explicit so each phase partial-aggregates.
  // 100 TB: phase 1 shuffles at most one row per (window, user) —
  // repeat-heavy traffic collapses before the exchange; phase 2 is
  // window-count-sized. The slide duplication factor (len/slide = 2)
  // rides the same bound as EV2.
  def slidingUniques(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(window($"ts", "1 hour", "30 minutes").as("w"), $"user_id")
      .select($"w.start".as("window_start"), $"user_id")
      .distinct()
      .groupBy($"window_start").agg(count(lit(1)).as("n_users"))
      .orderBy($"window_start")
  }

  val slidingUniquesSql: String =
    """SELECT window_start, COUNT(*) AS n_users FROM (
      |  SELECT DISTINCT
      |    time_bucket(INTERVAL '30 minutes', ts) - o.off * INTERVAL '30 minutes' AS window_start,
      |    user_id
      |  FROM events CROSS JOIN (VALUES (0), (1)) o(off))
      |GROUP BY window_start
      |ORDER BY window_start""".stripMargin

  // ---------------------------------------------------------------------
  // W11 CUSUM changepoint detection over the hourly event-count series:
  // the classic mean-shift statistic S_i = Σ_{j<=i}(c_j − mean), peak |S|
  // marks the most likely change hour. Kept EXACT: with n hours and total
  // T events, n·S_i = n·cum_i − i·T is integer — the statistic is scaled
  // by n and computed entirely in int64 (no float mean, no summation-
  // order exposure; the w9/g1 discipline taken to its limit: zero floats).
  // Output: top 5 candidate change hours by (|n·S| desc, hr asc).
  //
  // 100 TB: the raw scan reduces to an hour-keyed partial-agg (map-side
  // combine) — the only full-data pass. The cumulative sweep then runs on
  // the AGGREGATED series (one row per hour: years fit in a node), so the
  // single-partition window is bounded by calendar length, not data size;
  // a decades-long series would window over (year) ranges with carried
  // offsets (the w5 gapfill two-phase shape).
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy($"hr").rowsBetween(Window.unboundedPreceding, 0)
    val tot = hourly.agg(sum($"cnt").as("t_all"), count(lit(1)).as("n_hr"))
    hourly
      .withColumn("cum", sum($"cnt").over(wCum))
      .withColumn("i", row_number().over(Window.orderBy($"hr")).cast("long"))
      .crossJoin(broadcast(tot))
      .withColumn("ns", $"n_hr" * $"cum" - $"i" * $"t_all")
      .select($"hr", $"cnt", $"cum", $"ns", abs($"ns").as("abs_ns"))
      .orderBy($"abs_ns".desc, $"hr".asc)
      .limit(5)
  }

  val cusumSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_all, COUNT(*) AS n_hr FROM hourly),
      |sweep AS (
      |  SELECT hr, cnt,
      |    CAST(SUM(cnt) OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(ROW_NUMBER() OVER (ORDER BY hr) AS BIGINT) AS i
      |  FROM hourly)
      |SELECT hr, cnt, cum,
      |  n_hr * cum - i * t_all AS ns,
      |  abs(n_hr * cum - i * t_all) AS abs_ns
      |FROM sweep CROSS JOIN tot
      |ORDER BY abs_ns DESC, hr ASC
      |LIMIT 5""".stripMargin

  // ---------------------------------------------------------------------
  // W12 rolling exact median (w7 EWMA's robust sibling — the smoother
  // that shrugs off the outliers A12 flags): per-user trailing-16-event
  // median of `value`. Exact integer cents ride the bounded collected
  // frame (the w7 shape); the median of a sorted int array is pure
  // element access, and the one even-count interpolation is a FIXED
  // IEEE tree ((a+b)/2/100) both engines share — no percentile builtin,
  // whose interpolation conventions differ across engines.
  // 100 TB: one shuffle on user_id; frame is ROWS-bounded (16 int64s per
  // row), so state never scales with history length.
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-15, 0)
    Tables.events(spark, dir)
      .withColumn("xc", expr("CAST(round(value * 100) AS BIGINT)"))
      .withColumn("frame", array_sort(collect_list($"xc").over(w)))
      .withColumn("n", size($"frame"))
      .select($"user_id", $"event_id", $"value",
        expr("""CAST(element_at(frame, CAST(((n - 1) div 2) + 1 AS INT))
               |     + element_at(frame, CAST((n div 2) + 1 AS INT)) AS DOUBLE) / 2.0d / 100.0d"""
          .stripMargin.replace("\n", " ")).as("rolling_median"))
      .orderBy($"user_id", $"event_id")
  }

  val rollingMedianSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, value,
      |    list_sort(list(xc) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)) AS frame
      |  FROM e)
      |SELECT user_id, event_id, value,
      |  CAST(frame[(len(frame) - 1) // 2 + 1]
      |       + frame[len(frame) // 2 + 1] AS DOUBLE) / 2.0 / 100.0 AS rolling_median
      |FROM f ORDER BY user_id, event_id""".stripMargin

  /** EV7 position-based (U-shaped) multi-touch attribution: each purchase
    * credits the view/click touches of the same user in the 7 days before
    * it — 40% to the first touch, 40% to the last, the middle 20% split
    * across interior touches (the standard U-curve; 100%/50-50 for 1- and
    * 2-touch paths). The per-(purchase, touch) credit is INTEGER
    * milli-units (floor(20000/(m−2)+0.5) for interior touches), so the
    * per-channel totals are exact int64 sums — no float accumulation
    * order anywhere (the w9/G1 discipline).
    *
    * Shape: purchases ⋈ touches is a per-user equi-join with the 7-day
    * lookback as a band predicate; position/m come from one window keyed
    * by the purchase event id. A touch may legitimately credit several
    * purchases (standard MTA semantics).
    * 100 TB: the join shuffles on user_id (bounded fan-out = touches
    * within one week, not all history); the position window shuffles on
    * purchase id — no global sort, no driver state; per-channel rollup
    * partial-aggregates map-side.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_eid"), $"ts".as("p_ts"))
    val touches = ev.filter($"event_type".isin("view", "click"))
      .select($"user_id", $"event_id".as("t_eid"), $"ts".as("t_ts"),
        $"event_type".as("channel"))
    val paired = purchases.join(touches, Seq("user_id"))
      .filter($"t_ts" < $"p_ts" && $"t_ts" >= $"p_ts" - expr("INTERVAL 7 DAY"))
    val w = Window.partitionBy($"p_eid").orderBy($"t_ts", $"t_eid")
    val credited = paired
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy($"p_eid")))
      .withColumn("credit_milli",
        when($"m" === 1, lit(100000L))
          .when($"m" === 2, lit(50000L))
          .when($"rn" === 1 || $"rn" === $"m", lit(40000L))
          .otherwise(floor(lit(20000.0) / ($"m" - 2) + lit(0.5)).cast("long")))
    credited.groupBy($"channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct($"p_eid").as("n_purchases"),
        sum($"credit_milli").as("credit_milli"))
      .orderBy($"channel")
  }

  val attributionSql: String =
    """WITH purchases AS (
      |  SELECT user_id, event_id AS p_eid, ts AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |touches AS (
      |  SELECT user_id, event_id AS t_eid, ts AS t_ts, event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click')),
      |paired AS (
      |  SELECT p.p_eid, t.t_eid, t.t_ts, t.channel,
      |    ROW_NUMBER() OVER (PARTITION BY p.p_eid ORDER BY t.t_ts, t.t_eid) AS rn,
      |    COUNT(*) OVER (PARTITION BY p.p_eid) AS m
      |  FROM purchases p JOIN touches t ON t.user_id = p.user_id
      |  WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY)
      |SELECT channel, COUNT(*) AS n_touches,
      |  COUNT(DISTINCT p_eid) AS n_purchases,
      |  CAST(SUM(CASE WHEN m = 1 THEN 100000
      |                WHEN m = 2 THEN 50000
      |                WHEN rn = 1 OR rn = m THEN 40000
      |                ELSE CAST(floor(CAST(20000 AS DOUBLE) / (m - 2) + 0.5) AS BIGINT) END) AS BIGINT)
      |    AS credit_milli
      |FROM paired GROUP BY channel ORDER BY channel""".stripMargin

  /** EV8 first-order Markov transition matrix over per-user event
    * sequences — the "what happens next" model behind session analysis
    * and next-action features. Each user's events order by (ts, event_id)
    * (a total order — the W1 determinism rule); `lag` pairs every event
    * with its predecessor type; transition probability is INTEGER
    * micro-units (cnt·10⁶ div row_total) so the matrix is exact in both
    * engines — no float division drift.
    * 100 TB: one window shuffle on user_id (sequences stay within a
    * partition), then a 25-cell aggregate that partial-aggs map-side;
    * the matrix is alphabet², independent of data size — the same
    * sketch-sized-state argument as A19/A20.
    */
  def markov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
    val cnt = pairs.groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy($"prev_type").agg(sum($"n").as("row_total"))
    cnt.join(broadcast(tot), Seq("prev_type"))
      .select($"prev_type", $"next_type", $"n",
        expr("CAST(n * 1000000 div row_total AS BIGINT)").as("p_micro"))
      .orderBy($"prev_type", $"next_type")
  }

  val markovSql: String =
    """WITH pairs AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |cnt AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM pairs WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, event_type),
      |tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total FROM cnt GROUP BY prev_type)
      |SELECT c.prev_type, c.next_type, c.n,
      |  CAST(c.n * 1000000 // t.row_total AS BIGINT) AS p_micro
      |FROM cnt c JOIN tot t ON t.prev_type = c.prev_type
      |ORDER BY c.prev_type, c.next_type""".stripMargin

  /** EV9 cumulative first-seen users (the "total users over time" curve):
    * running DISTINCT count expanded into the scalable two-phase form —
    * distinct-over-a-running-window isn't windowable directly, but each
    * user's FIRST event day is min(ts) per user (a plain partial-agg, no
    * per-user ranking window), daily new-user counts aggregate that, and
    * the cumulative sum runs over the calendar-bounded day series (the
    * w9/w11 "series-sized window" precedent — ordering a global window by
    * day is fine because the frame is days, not events).
    * 100 TB: pass 1 is one map-side-combined aggregate on user_id; the
    * global window touches ≤ a few thousand day rows regardless of event
    * volume.
    */
  def firstSeen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // argmin as min-of-struct: (ts, event_id) is a total order, so the
    // struct minimum IS the user's first event — one map-side-combined
    // aggregate, where a per-user ranking window would shuffle every event
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(min(struct($"ts", $"event_id", $"event_type")).as("f"))
      .select(to_date($"f.ts").as("day"), $"f.event_type".as("first_type"))
      .groupBy($"day", $"first_type").agg(count(lit(1)).as("n_new_users"))
    val wCum = Window.partitionBy($"first_type")
      .orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cum_users", sum($"n_new_users").over(wCum))
      .orderBy($"day", $"first_type")
  }

  val firstSeenSql: String =
    """WITH f AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, event_type AS first_type
      |  FROM events
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1),
      |d AS (SELECT day, first_type, COUNT(*) AS n_new_users FROM f GROUP BY day, first_type)
      |SELECT day, first_type, n_new_users,
      |  CAST(SUM(n_new_users) OVER (PARTITION BY first_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d ORDER BY day, first_type""".stripMargin

  /** W13 rolling z-score — the WINDOWED sibling of A12's global robust
    * outliers (live drift screens use a trailing frame, not all history):
    * per user, the trailing-16-event mean/σ come from exact int64 cents
    * sufficient statistics (n, Σx, Σx²) over one ROWS frame, and
    * z = (x·n − Σx)/√(n·Σx² − Σx²) is ONE fixed IEEE tree over identical
    * int64 operands — no float accumulation (the w9 discipline; the
    * algebra clears both divisions so the only irrational step is the
    * final sqrt). Guards: ≥8 events in frame and positive variance, else
    * null. 100 TB: one user_id window shuffle; all three statistics ride
    * the SAME frame — one sort, no extra passes (the w8/a16
    * shared-shuffle pattern, PlanSpec-style single Exchange).
    */
  def rollingZ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-15, 0)
    Tables.events(spark, dir)
      .withColumn("xc", expr("CAST(round(value * 100) AS BIGINT)"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum($"xc").over(w))
      .withColumn("s2", sum($"xc" * $"xc").over(w))
      .select($"user_id", $"event_id", $"value",
        when($"n" >= 8 && ($"n" * $"s2" - $"s" * $"s") > 0,
          round(($"xc" * $"n" - $"s").cast("double")
            / sqrt(($"n" * $"s2" - $"s" * $"s").cast("double")), 4)).as("roll_z"))
      .orderBy($"user_id", $"event_id")
  }

  val rollingZSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, value,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, value, xc,
      |    COUNT(*) OVER w AS n, SUM(xc) OVER w AS s, SUM(xc * xc) OVER w AS s2
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, value,
      |  CASE WHEN n >= 8 AND n * s2 - s * s > 0
      |       THEN round(CAST(xc * n - s AS DOUBLE)
      |                  / sqrt(CAST(n * s2 - s * s AS DOUBLE)), 4) END AS roll_z
      |FROM f ORDER BY user_id, event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_rollz"    -> (rollingZ _),
    "ev9_first_seen" -> (firstSeen _),
    "ev8_markov"   -> (markov _),
    "ev7_attrib"   -> (attribution _),
    "w11_cusum"    -> (cusum _),
    "w12_rollmed"  -> (rollingMedian _),
    "ev_uniques"   -> (slidingUniques _),
    "w9_seasonal"  -> (seasonalDecomp _),
    "w10_interp"   -> (interpolate _),
    "ev_tumbling"  -> (tumbling _),
    "ev_sliding"   -> (sliding _),
    "ev_session"   -> (session _),
    "ev_funnel"    -> (funnel _),
    "ev_retention" -> (retention _),
    "w5_gapfill"   -> (gapfill _),
    "w7_ewma"      -> (ewma _),
    "w8_streak"    -> (streak _))

  val oracles: Map[String, String] = Map(
    "w13_rollz"    -> rollingZSql,
    "ev9_first_seen" -> firstSeenSql,
    "ev8_markov"   -> markovSql,
    "ev7_attrib"   -> attributionSql,
    "w11_cusum"    -> cusumSql,
    "w12_rollmed"  -> rollingMedianSql,
    "ev_uniques"   -> slidingUniquesSql,
    "w9_seasonal"  -> seasonalDecompSql,
    "w10_interp"   -> interpolateSql,
    "ev_tumbling"  -> tumblingSql,
    "ev_sliding"   -> slidingSql,
    "ev_session"   -> sessionSql,
    "ev_funnel"    -> funnelSql,
    "ev_retention" -> retentionSql,
    "w5_gapfill"   -> gapfillSql,
    "w7_ewma"      -> ewmaSql,
    "w8_streak"    -> streakSql)
}
