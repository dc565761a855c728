package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Out-of-order replay simulation and the late-data audit channel —
  * SURVEY.md §2 rows S2 (replay producer) and S5/L2 (late side outputs).
  *
  * The reference's Producer perturbs each record's SERVING time by a random
  * 0..30 min offset before feeding Kafka (`Producer.java:30-43`,
  * `outputTimestamp += random.nextInt(lateness)`), and the windowed operators
  * route records older than the watermark to late side outputs
  * (`ActivePostStatistician.java:52-53,63,86`). Here the perturbation is a
  * DETERMINISTIC hash-jitter of the event id (so both engines and every run
  * agree), and the late channel is computed with the exact watermark rule:
  * a record is late iff its event time precedes (max event time of all
  * strictly-earlier arrivals) − 30 min — precisely the records a
  * 30-min-bounded-out-of-orderness watermark would drop
  * (`SocialNetwork.java:78-83`).
  *
  * Scale: the prior running max over arrival order is associative, so it is
  * computed with the exact two-pass decomposition (per-hour-bucket maxima +
  * prefix window over bucket totals + intra-bucket PARTITIONED prior-max
  * window) — no global single-partition window anywhere; identical results
  * to the sequential fold.
  */
object Replay {

  /** Deterministic serving-time jitter in [0, bound) seconds — the
    * `random.nextInt(lateness)` of `Producer.java:41` made reproducible.
    * Small-operand integer arithmetic evaluated identically by both
    * engines.
    *
    * Bounds: `s2_replay` uses the reference configuration (30 min, matching
    * `Config.outOfOrdernessBound`). With jitter < watermark delay the late
    * channel is PROVABLY empty — p arriving before e implies
    * es_p − es_e ≤ jitter_e − jitter_p < bound — which is exactly why the
    * reference pairs a 30-min watermark with 30-min lateness. `l2_late_audit`
    * therefore replays at the 2 h STRESS bound (serving perturbation beyond
    * the watermark bound), the configuration in which the late side output
    * actually carries records. */
  private def jitter(bound: Long): Column =
    ((col("event_id") % 100003L) * 31L + 7L) % lit(bound)
  private def jitterSql(bound: Long): String =
    s"(((event_id % 100003) * 31 + 7) % $bound)"

  /** events + event-time seconds + deterministic arrival time. Public so the
    * streaming twins can replay the same schedule (`Streams.x3_timer_resolver`). */
  def arrivals(s: SparkSession, dir: String, bound: Long = 1800L): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("es"))
      .withColumn("arrival_s", col("es") + jitter(bound))

  /** Attach `pmax` = max event-time over all STRICTLY EARLIER arrivals in
    * (arrival_s, event_id) order — the watermark source — via the exact
    * bucket-decomposed two-pass (max is associative: prefix of per-bucket
    * maxima + intra-bucket prior max, parallel across buckets). */
  private def withPriorMax(a: DataFrame): DataFrame = {
    val ev = a.withColumn("bucket", (col("arrival_s") / lit(3600L)).cast("long"))
    val perBucket = ev.groupBy(col("bucket")).agg(max(col("es")).as("bmax"))
    val prior = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals: thousands of rows at any scale — safe to broadcast
    val prefix = perBucket
      .withColumn("pmax_prev", max(col("bmax")).over(prior))
      .select(col("bucket"), col("pmax_prev"))
    val intra = Window.partitionBy(col("bucket"))
      .orderBy(col("arrival_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls: first row of first bucket gets null pmax
    ev.join(broadcast(prefix), Seq("bucket"))
      .withColumn("pmax", greatest(col("pmax_prev"), max(col("es")).over(intra)))
  }

  private def priorMaxSql(bound: Long): String =
    s"""a AS (
       |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS es,
       |         floor(epoch(ts))::BIGINT + ${jitterSql(bound)} AS arrival_s
       |  FROM events),
       |m AS (
       |  SELECT *, max(es) OVER (ORDER BY arrival_s, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |  FROM a)""".stripMargin

  /** S2: the replay schedule itself — per event its arrival time, serving
    * delay, and whether it arrives INVERTED (after some record with a later
    * event time): the out-of-orderness the reference's producer injects,
    * as an auditable table. */
  def s2_replay(s: SparkSession, dir: String): DataFrame =
    withPriorMax(arrivals(s, dir, 1800L))
      .select(col("event_id"), col("arrival_s"),
              (col("arrival_s") - col("es")).as("delay_s"),
              when(col("pmax").isNotNull && col("es") < col("pmax"), lit(1))
                .otherwise(lit(0)).as("inverted"))
      .orderBy("event_id")

  val s2ReplaySql: String =
    s"""WITH ${priorMaxSql(1800L)}
       |SELECT event_id, arrival_s, arrival_s - es AS delay_s,
       |       CASE WHEN pmax IS NOT NULL AND es < pmax THEN 1 ELSE 0 END AS inverted
       |FROM m ORDER BY event_id""".stripMargin

  /** L2/S5: the late-data side-output channel — every record a 30-minute
    * watermark would drop when the stream is replayed in arrival order,
    * with how far past the watermark it was. This is the audit stream the
    * reference emits via `OutputTag` late side outputs. */
  def l2_late_audit(s: SparkSession, dir: String): DataFrame =
    withPriorMax(arrivals(s, dir, 7200L))
      .filter(col("pmax").isNotNull && col("es") < col("pmax") - 1800L)
      .select(col("event_id"), col("user_id"), col("arrival_s"),
              col("es").as("event_s"),
              (col("pmax") - 1800L - col("es")).as("late_by_s"))
      .orderBy("event_id")

  val l2Sql: String =
    s"""WITH ${priorMaxSql(7200L)}
       |SELECT event_id, user_id, arrival_s, es AS event_s,
       |       pmax - 1800 - es AS late_by_s
       |FROM m WHERE pmax IS NOT NULL AND es < pmax - 1800
       |ORDER BY event_id""".stripMargin

  /** L7 (beyond the reference's L-rows): WATERMARK TUNING metrology — the
    * measurement that decides L1's bound instead of asserting it: exact
    * per-event-type quantiles (p50/p90/p99/max) of serving delay under the
    * replay schedule. A production team reads this table to pick the
    * watermark (p99 + margin) and the allowed lateness (the p99→max gap);
    * the reference hard-codes 30 min (SURVEY §2.6 L1) — this is where that
    * number would come from.
    *
    * Scale shape — the COUNTING-SORT quantile trick: delays live on a
    * BOUNDED integer domain (the jitter bound, ≤ 1800 values), so exact
    * quantiles need no per-type sort of the data — one (type, delay)
    * histogram shuffle (map-side combined), then cumulative sums over a
    * ≤ types × 1800-row relation. Contrast t9 (GK sketch, unbounded
    * domain) and t6 (bucketed two-pass ranking): three quantile
    * disciplines, each matched to its domain. No single-partition sort of
    * anything unbounded at any scale. */
  def l7_watermark_tuning(s: SparkSession, dir: String): DataFrame = {
    val del = arrivals(s, dir, 1800L)
      .select(col("event_type"), (col("arrival_s") - col("es")).as("delay_s"))
    val hist = del.groupBy(col("event_type"), col("delay_s"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("delay_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q(pnum: Int) = // smallest delay covering pnum% — exact integer compare
      min(when(col("cum") * 100 >= lit(pnum) * col("n"), col("delay_s")))
    hist.withColumn("cum", sum(col("c")).over(wcum))
      .join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"), q(50).as("p50"), q(90).as("p90"),
           q(99).as("p99"), max(col("delay_s")).as("max_delay"))
      .orderBy("event_type")
  }

  val l7Sql: String =
    """WITH a AS (
      |  SELECT event_type,
      |         (((event_id % 100003) * 31 + 7) % 1800)::BIGINT AS delay_s
      |  FROM events
      |), h AS (
      |  SELECT event_type, delay_s, count(*)::BIGINT AS c FROM a GROUP BY 1, 2
      |), cum AS (
      |  SELECT event_type, delay_s, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY delay_s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
      |  FROM h
      |), t AS (SELECT event_type, sum(c)::BIGINT AS n FROM h GROUP BY 1)
      |SELECT cum.event_type, max(n) AS n_events,
      |  min(CASE WHEN cum * 100 >= 50 * n THEN delay_s END) AS p50,
      |  min(CASE WHEN cum * 100 >= 90 * n THEN delay_s END) AS p90,
      |  min(CASE WHEN cum * 100 >= 99 * n THEN delay_s END) AS p99,
      |  max(delay_s) AS max_delay
      |FROM cum JOIN t USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** L5: speedup-proportional pacing — the reference's producer sleeps
    * `(next.arrival − prev.arrival) / speedupFactor` wall-time between
    * emissions (`Producer.java:66-73`; `speedupFactor=604800` = one
    * event-time week per wall second per `project/README.md` step 8,
    * `Config.java:35` ships 900000). Maps each arrival second to the
    * wall-clock millisecond it should be SERVED at. Demo-only in the
    * reference (SURVEY §2 row L5) so it stays off the query surface;
    * `PacedReplaySpec` drives two paced micro-batches through it. */
  def pacedWallMillis(arrivalS: Seq[Long], speedup: Long, wallStartMs: Long): Seq[Long] = {
    require(speedup > 0, "speedupFactor must be positive")
    val t0 = arrivalS.min
    arrivalS.map(a => wallStartMs + (a - t0) * 1000L / speedup)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_replay"     -> (s2_replay _),
    "l2_late_audit" -> (l2_late_audit _),
    "l7_watermark_tuning" -> (l7_watermark_tuning _))

  val oracles: Map[String, String] = Map(
    "s2_replay"     -> s2ReplaySql,
    "l2_late_audit" -> l2Sql,
    "l7_watermark_tuning" -> l7Sql)
}
