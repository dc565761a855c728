package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil._

/** Windowed aggregations — SURVEY.md §2.4 (W1-W10) re-expressed over the
  * driver's `events` table (the activity-stream analog: user_id ≈ person,
  * event_type ≈ activity subtype, value ≈ engagement measure).
  *
  * Scale notes: tumbling/sliding windows are single `groupBy(window(...))`
  * shuffles with map-side partial aggregation — the reference's hand-built
  * two-level pane cascade (ActivePostStatistician.java:56-60) is subsumed by
  * Catalyst's partial/final aggregation; a sliding window of k panes costs
  * one shuffle, not k. Window starts are emitted as epoch-second BIGINTs so
  * the DuckDB oracle (ns timestamps) and Spark (µs) agree bit-for-bit.
  * All windows use UTC epoch alignment, matching both Flink's default window
  * alignment (SlidingWindowEvaluator.java:22-25) and DuckDB's time_bucket.
  */
object Windows {

  private def winStart(c: String = "window.start") = unix_timestamp(col(c))

  /** Exact-decimal groupBy sum + floor-round — run-stable under any shuffle
    * merge order (see QUtil.round4). The matching oracle form is
    * `floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0`. */
  private[queries] def dsum2(c: org.apache.spark.sql.Column) =
    round2(sum(c.cast("decimal(18,6)")).cast("double"))
  private val dsumSql =
    "floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0"

  /** W1/W8: per-type tumbling 1 h counts + sums (CountMessages analog). */
  def w1_tumbling_counts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .select(winStart().as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val w1Sql: String =
    """SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT AS win_start,
      |       event_type, count(*) AS n, floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W2/W3: sliding 6 h window, 1 h slide, per type — the active-post
    * statistics shape (12h/30min in the reference). Spark expands the slide
    * panes natively inside one hash aggregate. */
  def w2_sliding_counts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .select(winStart().as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val w2Sql: String =
    """SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT - 3600 * k AS win_start,
      |       event_type, count(*) AS n, floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM events CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS k)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W4: unique engaged users per sliding 12 h / 1 h window (exact
    * `size(collect_set)` semantics via count_distinct; the 100 TB variant is
    * `approx_count_distinct` — see w4_approx below, rows-only checked). */
  def w4_unique_users(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "12 hours", "1 hour"), col("event_type"))
      .agg(count_distinct(col("user_id")).as("uniq_users"))
      .select(winStart().as("win_start"), col("event_type"), col("uniq_users"))
      .orderBy("win_start", "event_type")

  val w4Sql: String =
    """SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT - 3600 * k AS win_start,
      |       event_type, count(DISTINCT user_id) AS uniq_users
      |FROM events CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS k)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W8/ST4 shape: per-user tumbling 10 min sums (wiki-edits assignment). */
  def w8_user_tumbling_sum(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .select(winStart().as("win_start"), col("user_id"), col("n"), col("sum_value"))
      .orderBy("win_start", "user_id")

  val w8Sql: String =
    """SELECT floor(epoch(time_bucket(INTERVAL '10 minutes', ts)))::BIGINT AS win_start,
      |       user_id, count(*) AS n, floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W9: session windows, 30 min gap, per user — built-in `session_window`
    * (the reference hand-built this as a Timely `unary_frontier` operator,
    * session-5-custom-operators/session/src/bin/mine.rs:17-110). Session
    * start floors to epoch seconds for oracle parity. */
  def w9_session_windows(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
      .select(winStart("session_window.start").as("sess_start"),
              col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  // gap arithmetic on µs (the engines' coarsest common precision): Spark's
  // session_window sees µs-truncated timestamps, so a gap a few ns short of
  // 30 min must break (or not) identically in the oracle
  val w9Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value, epoch_ns(ts) // 1000 AS us, event_id,
      |    CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
      |         OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w
      |            >= 1800000000 THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |), sess AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT floor(epoch(min(ts)))::BIGINT AS sess_start, user_id,
      |       count(*) AS n_events, floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin

  /** W12: DYNAMIC-GAP session windows — `session_window` with a per-row gap
    * expression (purchases hold a session open 2 h, everything else
    * 30 min), the engagement-weighted sessionization an activity pipeline
    * actually wants (a conversion event extends the visit; a stray click
    * doesn't). Each event spans [ts, ts + its own gap) and overlapping
    * spans merge per user — so unlike w9's fixed gap, a session's end is
    * the running MAX of member ends, not last-event + constant.
    *
    * The oracle mirrors exactly that: a running max of per-event end
    * micros over the (user, time) window, break when the next event
    * starts at-or-after it (the same µs grid and >= boundary w9 pinned),
    * then the standard island sum. Plan shape is identical to w9: one
    * shuffle on user_id, sessions assembled inside the aggregation —
    * the gap expression is a pure projection, free at any scale. */
  def w12_dynamic_sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"),
        when(col("event_type") === "purchase", "2 hours").otherwise("30 minutes")),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
      .select(winStart("session_window.start").as("sess_start"),
              col("user_id"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start")

  val w12Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts, value, event_id, epoch_ns(ts) // 1000 AS us,
      |    epoch_ns(ts) // 1000 + CASE WHEN event_type = 'purchase'
      |      THEN 7200000000 ELSE 1800000000 END AS end_us
      |  FROM events
      |), m AS (
      |  SELECT *, max(end_us) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM o
      |), b AS (
      |  SELECT *, CASE WHEN prev_end IS NULL OR us >= prev_end
      |    THEN 1 ELSE 0 END AS brk FROM m
      |), sess AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM b)
      |SELECT floor(epoch(min(ts)))::BIGINT AS sess_start, user_id,
      |       count(*) AS n_events,
      |       floor(sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin

  /** W7/F6: top-5 "recommendations" — per event_type, per-user dynamic
    * (sum of value) and static (activity count) scores are min-max
    * normalized (degenerate span → 1.0, FriendRecommender.java:346-354),
    * blended 0.3·static + 0.7·dynamic (Config.java:83), ranked top-5 with a
    * deterministic user_id tie-break. Ranking happens on the ROUNDED blend so
    * both engines rank identically despite last-bit double drift. */
  def w7_top5_blend(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("dyn"),
           count(lit(1)).cast("double").as("stat"))
    val w = Window.partitionBy(col("event_type"))
    def mmNorm(c: String) = {
      val (mn, mx) = (min(col(c)).over(w), max(col(c)).over(w))
      when(mx === mn, 1.0).otherwise((col(c) - mn) / (mx - mn))
    }
    val scored = perUser
      .withColumn("score", round4(lit(0.3) * mmNorm("stat") + lit(0.7) * mmNorm("dyn")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("score").desc, col("user_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("event_type"), col("user_id"), col("score"), col("rank"))
      .orderBy("event_type", "rank")
  }

  val w7Sql: String =
    """WITH per_user AS (
      |  SELECT event_type, user_id,
      |         sum(CAST(value AS DECIMAL(18,6)))::VARCHAR::DOUBLE AS dyn, count(*)::DOUBLE AS stat
      |  FROM events GROUP BY 1, 2
      |), norm AS (
      |  SELECT event_type, user_id,
      |    CASE WHEN max(stat) OVER w = min(stat) OVER w THEN 1.0
      |         ELSE (stat - min(stat) OVER w) / (max(stat) OVER w - min(stat) OVER w) END AS stat_n,
      |    CASE WHEN max(dyn) OVER w = min(dyn) OVER w THEN 1.0
      |         ELSE (dyn - min(dyn) OVER w) / (max(dyn) OVER w - min(dyn) OVER w) END AS dyn_n
      |  FROM per_user WINDOW w AS (PARTITION BY event_type)
      |), scored AS (
      |  SELECT event_type, user_id,
      |         floor((0.3 * stat_n + 0.7 * dyn_n) * 10000.0 + 0.5) / 10000.0 AS score FROM norm
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY score DESC, user_id) AS rank
      |  FROM scored)
      |SELECT event_type, user_id, score, rank FROM ranked
      |WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin

  /** W2 as the reference's literal two-level pane cascade
    * (ActivePostStatistician.java:56-60): 1-hour tumbling pre-counts, then a
    * 6-hour rolling sum over the pane table with a RANGE frame (time-based,
    * so pane gaps are handled). Compared to `w2_sliding_counts` this trades
    * the k× slide-pane row expansion for a second (tiny) shuffle over the
    * pane table — the winning plan when duration/slide is large. Emits one
    * row per non-empty pane: (window ending at pane end, counts over the
    * trailing 6 h). */
  def w3_pane_cascade(s: SparkSession, dir: String): DataFrame = {
    val pane = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("pn"),
           sum(col("value").cast("decimal(18,6)")).as("psum"))
      .select(unix_timestamp(col("window.start")).as("pane_start"),
              col("event_type"), col("pn"), col("psum"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("pane_start"))
      .rangeBetween(-5 * 3600L, 0L)
    pane
      .select(col("pane_start"), col("event_type"),
              sum(col("pn")).over(w).as("n"),
              round2(sum(col("psum")).over(w).cast("double")).as("sum_value"))
      .orderBy("pane_start", "event_type")
  }

  val w3Sql: String =
    """WITH pane AS (
      |  SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT AS pane_start,
      |         event_type, count(*) AS pn,
      |         sum(CAST(value AS DECIMAL(18,6))) AS psum
      |  FROM events GROUP BY 1, 2)
      |SELECT pane_start, event_type,
      |  sum(pn) OVER w::BIGINT AS n,
      |  floor(sum(psum) OVER w::DOUBLE * 100.0 + 0.5) / 100.0 AS sum_value
      |FROM pane
      |WINDOW w AS (PARTITION BY event_type ORDER BY pane_start
      |             RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW)
      |ORDER BY pane_start, event_type""".stripMargin

  /** W4 scale path: `approx_count_distinct` (HLL++) replaces the exact
    * distinct count — mergeable constant-size sketches instead of per-group
    * sets, the declared 100 TB variant (SURVEY.md §7.3). A sketch has no
    * replayable DuckDB oracle, so the QUERY IS THE INVARIANT: it emits the
    * windows where the estimate violates the declared error contract
    * |hll − exact| ≤ max(3, 0.1·exact) (measured headroom at sf0.01:
    * max abs error 2 with rsd 0.02), and the oracle expects ZERO rows —
    * the same audit-query pattern as j4/s9_order_audit, which makes the
    * error bound driver-checkable instead of spec-only. */
  def w4_unique_users_approx(s: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.events(s, dir)
      .groupBy(window(col("ts"), "12 hours", "1 hour"), col("event_type"))
    val approx = grouped
      .agg(approx_count_distinct(col("user_id"), 0.02).as("uniq_approx"))
      .select(winStart().as("win_start"), col("event_type"), col("uniq_approx"))
    val exact = grouped
      .agg(count_distinct(col("user_id")).as("uniq_exact"))
      .select(winStart().as("win_start"), col("event_type"), col("uniq_exact"))
    approx.join(exact, Seq("win_start", "event_type"))
      .filter(abs(col("uniq_approx") - col("uniq_exact")) >
        greatest(lit(3.0), lit(0.1) * col("uniq_exact")))
      .select(col("win_start"), col("event_type"),
              col("uniq_exact"), col("uniq_approx"))
      .orderBy("win_start", "event_type")
  }

  val w4ApproxSql: String =
    // the sketch itself is not oracle-replayable; the contract is "no
    // bound violations", so the oracle is the empty relation with the
    // audit's exact schema
    """SELECT 0::BIGINT AS win_start, ''::VARCHAR AS event_type,
      |       0::BIGINT AS uniq_exact, 0::BIGINT AS uniq_approx
      |WHERE false""".stripMargin

  /** W4 via the typed set-union `Aggregator`
    * (`graft.functions.DistinctCountAgg`) — the reference's literal pane
    * accumulator as a custom UDAF, sharing w4's oracle. Kept on a coarser
    * window than w4 to bound set sizes (the scale guidance stands:
    * `count_distinct`/HLL first, set-valued state only when custom merge
    * semantics demand it). */
  def w5_distinct_agg(s: SparkSession, dir: String): DataFrame = {
    val distinctUsers = udaf(graft.functions.DistinctCountAgg)
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "12 hours", "1 hour"), col("event_type"))
      .agg(distinctUsers(col("user_id")).as("uniq_users"))
      .select(winStart().as("win_start"), col("event_type"), col("uniq_users"))
      .orderBy("win_start", "event_type")
  }

  /** W10 OHLC bars — the canonical time-series downsample: per user-hour
    * open/high/low/close/volume over the event values, the summary a
    * 100 TB tick/metric stream is stored as after ingest. Open and close
    * are selected by row_number rank over (ts, event_id) — first_value/
    * last_value semantics made explicit and tie-deterministic, never
    * engine-default frame behavior. Values quantize to integer cents; both
    * window passes and the final aggregation shuffle once on
    * (user_id, hr). */
  def w10_ohlc_bars(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .withColumn("hr", expr("us div 3600000000")) // integer div — never double
    val asc  = Window.partitionBy(col("user_id"), col("hr"))
      .orderBy(col("us").asc, col("event_id").asc)
    val desc = Window.partitionBy(col("user_id"), col("hr"))
      .orderBy(col("us").desc, col("event_id").desc)
    ev.withColumn("rna", row_number().over(asc))
      .withColumn("rnd", row_number().over(desc))
      .groupBy(col("user_id"), col("hr"))
      .agg(max(when(col("rna") === 1, col("cents"))).as("open"),
           max(col("cents")).as("high"),
           min(col("cents")).as("low"),
           max(when(col("rnd") === 1, col("cents"))).as("close"),
           count(lit(1)).as("n"),
           sum(col("cents")).as("volume_cents"))
      .orderBy("user_id", "hr")
  }

  val w10Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
      |         (epoch_ns(ts) // 1000) // 3600000000 AS hr,
      |         floor(value * 100.0 + 0.5)::BIGINT AS cents
      |  FROM events),
      |r AS (
      |  SELECT user_id, hr, cents,
      |    row_number() OVER (PARTITION BY user_id, hr ORDER BY us, event_id) AS rna,
      |    row_number() OVER (PARTITION BY user_id, hr ORDER BY us DESC, event_id DESC) AS rnd
      |  FROM ev)
      |SELECT user_id, hr,
      |  max(CASE WHEN rna = 1 THEN cents END) AS open,
      |  max(cents) AS high, min(cents) AS low,
      |  max(CASE WHEN rnd = 1 THEN cents END) AS close,
      |  count(*) AS n, sum(cents)::BIGINT AS volume_cents
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** W11: per-window top-k — the "trending now" finisher every activity
    * dashboard runs (the reference's top-5 blend W7 is the recommender
    * variant; this is the plain per-window leaderboard). Tumbling 6-hour
    * windows, top-3 event types by count, ties broken lexically.
    *
    * Scale shape: one windowed count shuffle (map-side combined), then
    * `row_number` over a window PARTITIONED by win_start — thousands of
    * parallel per-window sorts of (#event-types) rows each, never a global
    * sort. [[graft.streaming.Streams.x18_stream_window_topk]] is the
    * streaming twin computing the identical result from timer-flushed
    * per-window state; it shares this oracle. */
  def w11_window_topk(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(winStart().as("win_start"), col("event_type"), col("n"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("win_start"))
          .orderBy(col("n").desc, col("event_type"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("win_start"), col("rank"), col("event_type"), col("n"))
      .orderBy("win_start", "rank")
  }

  val w11Sql: String =
    """WITH c AS (
      |  SELECT floor(epoch(time_bucket(INTERVAL '6 hours', ts)))::BIGINT AS win_start,
      |         event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT win_start, event_type, n,
      |    row_number() OVER (PARTITION BY win_start ORDER BY n DESC, event_type) AS rank
      |  FROM c)
      |SELECT win_start, rank, event_type, n FROM r WHERE rank <= 3
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w11_window_topk"        -> (w11_window_topk _),
    "w10_ohlc_bars"          -> (w10_ohlc_bars _),
    "w5_distinct_agg"        -> (w5_distinct_agg _),
    "w1_tumbling_counts"     -> (w1_tumbling_counts _),
    "w2_sliding_counts"      -> (w2_sliding_counts _),
    "w3_pane_cascade"        -> (w3_pane_cascade _),
    "w4_unique_users"        -> (w4_unique_users _),
    "w4_unique_users_approx" -> (w4_unique_users_approx _),
    "w8_user_tumbling_sum"   -> (w8_user_tumbling_sum _),
    "w9_session_windows"     -> (w9_session_windows _),
    "w12_dynamic_sessions"   -> (w12_dynamic_sessions _),
    "w7_top5_blend"          -> (w7_top5_blend _))

  val oracles: Map[String, String] = Map(
    "w11_window_topk"        -> w11Sql,
    "w4_unique_users_approx" -> w4ApproxSql,
    "w10_ohlc_bars"        -> w10Sql,
    "w5_distinct_agg"      -> w4Sql, // identical semantics to w4, custom UDAF path
    "w1_tumbling_counts"   -> w1Sql,
    "w2_sliding_counts"    -> w2Sql,
    "w3_pane_cascade"      -> w3Sql,
    "w4_unique_users"      -> w4Sql,
    "w8_user_tumbling_sum" -> w8Sql,
    "w9_session_windows"   -> w9Sql,
    "w12_dynamic_sessions" -> w12Sql,
    "w7_top5_blend"        -> w7Sql)
}
