package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil.{round2, round4}

/** Stateful / per-key analytic operators — SURVEY.md §2.3 (ST2-ST5).
  *
  * The reference implements these as Flink `ValueState` process functions;
  * the batch-exact equivalents are analytic window functions, which Spark
  * executes as a single sort-based window per partition key. Ordering inside
  * every window is (ts, event_id) — event_id breaks timestamp ties
  * deterministically so Spark (µs) and DuckDB (ns) sort identically.
  *
  * Scale notes: per-user windows (`st2`, `st4`) shuffle once on user_id and
  * scale out. The global-order operators (`st3`, `st5`) are inherently
  * sequential folds (the reference broadcast-replicates features to every
  * instance for the same reason, AnomalousUserDetector.java:66); they run as
  * a single-partition window — correct, but documented as the non-scalable
  * exact form. The scalable variant at 100 TB is a two-pass prefix
  * aggregation (per-partition partial sums + a tiny driver-side prefix of
  * partition totals), which `st3_anomaly_scalable` implements.
  */
object Stateful {

  private val userOrder   = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
  private val globalOrder = Window.orderBy(col("ts"), col("event_id"))

  /** ST2 ComputeFeatures: per-person 3-event moving activity frequency
    * (3·HOUR/max(1, t0−t2), −1 until 3 events seen —
    * AnomalousUserDetector.java:110-142) plus last-activity measure. */
  def st2_user_features(s: SparkSession, dir: String): DataFrame = {
    val sec = unix_timestamp(col("ts"))
    val t2 = lag(sec, 2).over(userOrder)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("freq",
        when(t2.isNull, lit(-1.0))
          .otherwise(round4(lit(3.0 * 3600.0) / greatest(sec - t2, lit(1L)))))
      .withColumn("prev_value", coalesce(lag(col("value"), 1).over(userOrder), lit(-1.0)))
      .select(col("event_id"), col("user_id"), col("freq"), col("prev_value"))
      .orderBy("event_id")
  }

  val st2Sql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN lag(floor(epoch(ts))::BIGINT, 2) OVER w IS NULL THEN -1.0
      |       ELSE floor(3.0 * 3600.0 / greatest(floor(epoch(ts))::BIGINT
      |                  - lag(floor(epoch(ts))::BIGINT, 2) OVER w, 1)
      |            * 10000.0 + 0.5) / 10000.0 END AS freq,
      |  coalesce(lag(value, 1) OVER w, -1.0) AS prev_value
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** ST3 UnusualUserDetector, exact semantics: each event compared against
    * the running mean over ALL prior events in global ts order
    * (Signatures.update, AnomalousUserDetector.java:160-200); flag when the
    * event's measure breaches 2× the running mean. Single-partition window =
    * the exact sequential fold.
    *
    * The running mean is computed as exact-decimal running sum / count —
    * decimal addition is associative (unlike IEEE doubles), so the result is
    * bit-identical across engines and across any parallel execution order. */
  def st3_anomaly_exact(s: SparkSession, dir: String): DataFrame = {
    val prior = globalOrder.rowsBetween(Window.unboundedPreceding, -1)
    val runAvg = (sum(col("value").cast("decimal(18,6)")).over(prior).cast("double")
                  / count(lit(1)).over(prior))
    Tables.events(s, dir)
      .withColumn("run_avg", runAvg)
      .filter(col("run_avg").isNotNull && col("value") > lit(2.0) * col("run_avg"))
      .select(col("event_id"), col("user_id"), col("value"),
              round4(col("run_avg")).as("run_avg"))
      .orderBy("event_id")
  }

  val st3Sql: String =
    """WITH f AS (
      |  SELECT event_id, user_id, value,
      |    sum(CAST(value AS DECIMAL(18,6))) OVER w::DOUBLE
      |      / count(*) OVER w AS run_avg
      |  FROM events
      |  WINDOW w AS (ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, value,
      |       floor(run_avg * 10000.0 + 0.5) / 10000.0 AS run_avg
      |FROM f WHERE run_avg IS NOT NULL AND value > 2.0 * run_avg
      |ORDER BY event_id""".stripMargin

  /** ST3, scalable form: same detector but against per-hour-bucket completed
    * prefixes — each event compares to the mean of all events in STRICTLY
    * EARLIER 1 h buckets. The prefix is computed as a tiny per-bucket
    * aggregate (one shuffle on bucket) + an unbounded window over bucket
    * totals (thousands of rows, not billions) joined back — this is the
    * two-pass prefix-sum pattern that replaces the sequential global fold at
    * 100 TB. Semantics deliberately bucket-granular (documented divergence
    * from st3_anomaly_exact). */
  def st3_anomaly_scalable(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("bucket", unix_timestamp(window(col("ts"), "1 hour").getField("start")))
    val perBucket = ev.groupBy(col("bucket"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("bsum"), count(lit(1)).as("bcnt"))
    val prior = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .withColumn("psum", sum(col("bsum")).over(prior))
      .withColumn("pcnt", sum(col("bcnt")).over(prior))
      .select(col("bucket"), (col("psum").cast("double") / col("pcnt")).as("prior_avg"))
    ev.join(broadcast(prefix), Seq("bucket"))
      .filter(col("prior_avg").isNotNull && col("value") > lit(2.0) * col("prior_avg"))
      .select(col("event_id"), col("user_id"), col("value"),
              round4(col("prior_avg")).as("prior_avg"))
      .orderBy("event_id")
  }

  val st3ScalableSql: String =
    """WITH b AS (
      |  SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT AS bucket,
      |         sum(CAST(value AS DECIMAL(18,6))) AS bsum, count(*) AS bcnt
      |  FROM events GROUP BY 1
      |), prefix AS (
      |  SELECT bucket,
      |    sum(bsum) OVER p::DOUBLE / sum(bcnt) OVER p AS prior_avg
      |  FROM b WINDOW p AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_id, user_id, value,
      |       floor(prior_avg * 10000.0 + 0.5) / 10000.0 AS prior_avg
      |FROM events e
      |JOIN prefix ON floor(epoch(time_bucket(INTERVAL '1 hour', e.ts)))::BIGINT = prefix.bucket
      |WHERE prior_avg IS NOT NULL AND value > 2.0 * prior_avg
      |ORDER BY event_id""".stripMargin

  /** ST4: per-user running cumulative sum (wiki-edits ComputeDiffs,
    * session-9/FlinkKafkaConsumer.java:108-137). Identical summation order in
    * both engines ⇒ bit-identical doubles; rounded anyway. */
  def st4_running_user_sum(s: SparkSession, dir: String): DataFrame = {
    val run = userOrder.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
              round2(sum(col("value").cast("decimal(18,6)")).over(run)
                .cast("double")).as("run_sum"),
              count(lit(1)).over(run).as("run_n"))
      .orderBy("event_id")
  }

  val st4Sql: String =
    """SELECT event_id, user_id,
      |  floor(sum(CAST(value AS DECIMAL(18,6))) OVER w::DOUBLE * 100.0 + 0.5) / 100.0 AS run_sum,
      |  count(*) OVER w AS run_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  /** ST5: global running average (Timely `average` custom unary operator,
    * session-5-custom-operators/average/src/main.rs:15-34): emits
    * (x, mean-so-far) per element in stream order. */
  def st5_running_avg(s: SparkSession, dir: String): DataFrame = {
    val run = globalOrder.rowsBetween(Window.unboundedPreceding, 0)
    val runAvg = (sum(col("value").cast("decimal(18,6)")).over(run).cast("double")
                  / count(lit(1)).over(run))
    Tables.events(s, dir)
      .select(col("event_id"), col("value"), round4(runAvg).as("run_avg"))
      .orderBy("event_id")
  }

  val st5Sql: String =
    """SELECT event_id, value,
      |  floor(sum(CAST(value AS DECIMAL(18,6))) OVER w::DOUBLE
      |        / count(*) OVER w * 10000.0 + 0.5) / 10000.0 AS run_avg
      |FROM events
      |WINDOW w AS (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  /** ST3 full fidelity: the reference's two-stage anomaly pipeline with
    * SENTINEL-AWARE running means (Signatures.update skips −1-valued
    * features, AnomalousUserDetector.java:160-185 — SURVEY §2.7 F8). Stage 1
    * = per-user 3-event moving frequency (−1 until 3 events seen, ST2);
    * stage 2 = global ts-ordered running mean over ONLY the non-sentinel
    * prior frequencies (conditional decimal sums), flag when
    * freq > 2 × that mean. */
  def st6_conditional_signature(s: SparkSession, dir: String): DataFrame = {
    val sec = unix_timestamp(col("ts"))
    val t2 = lag(sec, 2).over(userOrder)
    val withFreq = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("freq",
        when(t2.isNull, lit(-1.0))
          .otherwise(lit(3.0 * 3600.0) / greatest(sec - t2, lit(1L))))
    val prior = globalOrder.rowsBetween(Window.unboundedPreceding, -1)
    val condSum = sum(when(col("freq") =!= -1.0, col("freq").cast("decimal(30,10)"))).over(prior)
    val condCnt = count(when(col("freq") =!= -1.0, lit(1))).over(prior)
    withFreq
      .withColumn("sig_mean", condSum.cast("double") / condCnt)
      .filter(col("freq") =!= -1.0 && col("sig_mean").isNotNull &&
              col("freq") > lit(2.0) * col("sig_mean"))
      .select(col("event_id"), col("user_id"),
              round4(col("freq")).as("freq"), round4(col("sig_mean")).as("sig_mean"))
      .orderBy("event_id")
  }

  val st6Sql: String =
    """WITH f AS (
      |  SELECT event_id, user_id, ts,
      |    CASE WHEN lag(floor(epoch(ts))::BIGINT, 2) OVER u IS NULL THEN -1.0
      |         ELSE 3.0 * 3600.0 / greatest(floor(epoch(ts))::BIGINT
      |              - lag(floor(epoch(ts))::BIGINT, 2) OVER u, 1) END AS freq
      |  FROM events WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sig AS (
      |  SELECT event_id, user_id, freq,
      |    sum(CASE WHEN freq <> -1.0 THEN freq::DECIMAL(30,10) END) OVER g::DOUBLE
      |      / count(CASE WHEN freq <> -1.0 THEN 1 END) OVER g AS sig_mean
      |  FROM f WINDOW g AS (ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id,
      |  floor(freq * 10000.0 + 0.5) / 10000.0 AS freq,
      |  floor(sig_mean * 10000.0 + 0.5) / 10000.0 AS sig_mean
      |FROM sig
      |WHERE freq <> -1.0 AND sig_mean IS NOT NULL AND freq > 2.0 * sig_mean
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st6_conditional_signature" -> (st6_conditional_signature _),
    "st2_user_features"     -> (st2_user_features _),
    "st3_anomaly_exact"     -> (st3_anomaly_exact _),
    "st3_anomaly_scalable"  -> (st3_anomaly_scalable _),
    "st4_running_user_sum"  -> (st4_running_user_sum _),
    "st5_running_avg"       -> (st5_running_avg _))

  val oracles: Map[String, String] = Map(
    "st6_conditional_signature" -> st6Sql,
    "st2_user_features"     -> st2Sql,
    "st3_anomaly_exact"     -> st3Sql,
    "st3_anomaly_scalable"  -> st3ScalableSql,
    "st4_running_user_sum"  -> st4Sql,
    "st5_running_avg"       -> st5Sql)
}
