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

  /** The reference's full per-activity feature vector
    * (AnomalousUserDetector.java `Features.update`, :110-142): 3-event moving
    * frequency, plus length and unique-words ratio of the CURRENT activity's
    * content — recorded under the comment-kind features when the activity is
    * comment-like, under the post-kind features when post-like, with −1
    * sentinels everywhere else (every `update` overwrites all four, so each
    * row reflects only its own activity's kind).
    *
    * The events testdata carries no prose content, so content is derived
    * deterministically from the row (`event_type` + `props`, with the type
    * token doubled on k%3==0 rows so the unique-words ratio is non-constant);
    * kind mapping: click/view ⇒ comment-like, purchase ⇒ post-like,
    * signup/error ⇒ neither. The feature SEMANTICS (current-activity
    * overwrite + per-kind sentinels) are the reference's exactly.
    *
    * Scale: one shuffle on user_id for the lag window; everything else is a
    * per-row projection. */
  private def withFeatures(s: SparkSession, dir: String): DataFrame = {
    val sec = unix_timestamp(col("ts"))
    val t2 = lag(sec, 2).over(userOrder)
    // digitless props extract to '' → NULL after the cast; coalesce to 0 so
    // batch, the x7 streaming twin (getOrElse(0)), and the oracle
    // (TRY_CAST+COALESCE) agree on the k%3==0 branch for such rows
    val k = coalesce(regexp_extract(col("props"), "([0-9]+)", 1).cast("int"), lit(0))
    val content = when(k % 3 === 0,
        concat_ws(" ", col("event_type"), col("event_type"), col("props")))
      .otherwise(concat_ws(" ", col("event_type"), col("props")))
    val isComment = col("event_type").isin("click", "view")
    val isPost = col("event_type") === "purchase"
    val toks = split(content, " ")
    val uwr = size(array_distinct(toks)).cast("double") / size(toks)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
              col("event_type"), col("props"))
      .withColumn("freq",
        when(t2.isNull, lit(-1.0))
          .otherwise(lit(3.0 * 3600.0) / greatest(sec - t2, lit(1L))))
      .withColumn("comment_len",
        when(isComment, length(content).cast("long")).otherwise(lit(-1L)))
      .withColumn("post_len",
        when(isPost, length(content).cast("long")).otherwise(lit(-1L)))
      .withColumn("comment_ratio", when(isComment, uwr).otherwise(lit(-1.0)))
      .withColumn("post_ratio", when(isPost, uwr).otherwise(lit(-1.0)))
  }

  /** The DuckDB twin of [[withFeatures]]'s derived columns, as a CTE named
    * `feat` over `events`. */
  private val featSql: String =
    """feat AS (
      |  SELECT event_id, user_id, ts, value,
      |    CASE WHEN lag(floor(epoch(ts))::BIGINT, 2) OVER u IS NULL THEN -1.0
      |         ELSE 3.0 * 3600.0 / greatest(floor(epoch(ts))::BIGINT
      |              - lag(floor(epoch(ts))::BIGINT, 2) OVER u, 1) END AS freq,
      |    CASE WHEN event_type IN ('click','view') THEN length(content)::BIGINT ELSE -1 END AS comment_len,
      |    CASE WHEN event_type = 'purchase' THEN length(content)::BIGINT ELSE -1 END AS post_len,
      |    CASE WHEN event_type IN ('click','view') THEN uwr ELSE -1.0 END AS comment_ratio,
      |    CASE WHEN event_type = 'purchase' THEN uwr ELSE -1.0 END AS post_ratio
      |  FROM (
      |    SELECT *,
      |      len(list_distinct(string_split(content, ' ')))::DOUBLE
      |        / len(string_split(content, ' ')) AS uwr
      |    FROM (
      |      SELECT *, CASE WHEN COALESCE(TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT), 0) % 3 = 0
      |                     THEN event_type || ' ' || event_type || ' ' || props
      |                     ELSE event_type || ' ' || props END AS content
      |      FROM events))
      |  WINDOW u AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id))""".stripMargin

  /** ST2 ComputeFeatures: the full reference feature vector per activity —
    * 3-event moving frequency (3·HOUR/max(1, t0−t2), −1 until 3 events
    * seen), current-activity content length + unique-words ratio under
    * per-kind −1 sentinels (AnomalousUserDetector.java:110-142), plus the
    * previous activity's measure. */
  def st2_user_features(s: SparkSession, dir: String): DataFrame =
    withFeatures(s, dir)
      .withColumn("freq", when(col("freq") === -1.0, lit(-1.0)).otherwise(round4(col("freq"))))
      .withColumn("prev_value", coalesce(lag(col("value"), 1).over(userOrder), lit(-1.0)))
      .withColumn("comment_ratio",
        when(col("comment_ratio") === -1.0, lit(-1.0)).otherwise(round4(col("comment_ratio"))))
      .withColumn("post_ratio",
        when(col("post_ratio") === -1.0, lit(-1.0)).otherwise(round4(col("post_ratio"))))
      .select(col("event_id"), col("user_id"), col("freq"), col("prev_value"),
              col("comment_len"), col("post_len"), col("comment_ratio"), col("post_ratio"))
      .orderBy("event_id")

  val st2Sql: String =
    s"""WITH $featSql
      |SELECT event_id, user_id,
      |  CASE WHEN freq = -1.0 THEN -1.0
      |       ELSE floor(freq * 10000.0 + 0.5) / 10000.0 END AS freq,
      |  coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id), -1.0) AS prev_value,
      |  comment_len, post_len,
      |  CASE WHEN comment_ratio = -1.0 THEN -1.0
      |       ELSE floor(comment_ratio * 10000.0 + 0.5) / 10000.0 END AS comment_ratio,
      |  CASE WHEN post_ratio = -1.0 THEN -1.0
      |       ELSE floor(post_ratio * 10000.0 + 0.5) / 10000.0 END AS post_ratio
      |FROM feat
      |ORDER BY event_id""".stripMargin

  /** ST3 UnusualUserDetector, exact semantics: each event compared against
    * the running mean over ALL prior events in global ts order
    * (Signatures.update, AnomalousUserDetector.java:160-200); flag when the
    * event's measure breaches 2× the running mean.
    *
    * The running mean is computed as exact-decimal running sum / count —
    * decimal addition is associative (unlike IEEE doubles), so the result is
    * bit-identical across engines and across any parallel execution order.
    * Associativity is also why the query EXECUTES as the identical-result
    * bucket decomposition ([[st3_exact_scalable]]) rather than a
    * single-partition global window: the naive sequential fold
    * ([[st3_anomaly_naive]]) stays as the spec-level oracle cross-check
    * (`StatefulDecompositionSpec`), so the default plan is the one that
    * survives 100 TB and a bench run emits no global-window warnings. */
  def st3_anomaly_exact(s: SparkSession, dir: String): DataFrame =
    st3_exact_scalable(s, dir)

  /** The naive single-partition sequential fold of [[st3_anomaly_exact]] —
    * NOT a query entry; kept as the oracle cross-check the decomposition is
    * proven against. */
  private[graft] def st3_anomaly_naive(s: SparkSession, dir: String): DataFrame = {
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
      |  WINDOW w AS (ORDER BY epoch_ns(ts) // 1000, event_id
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
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  /** ST5: global running average (Timely `average` custom unary operator,
    * session-5-custom-operators/average/src/main.rs:15-34): emits
    * (x, mean-so-far) per element in stream order. Executes as the
    * identical-result bucket decomposition ([[st5_scalable]]); the naive
    * single-partition fold ([[st5_running_avg_naive]]) stays as the
    * spec-level cross-check. */
  def st5_running_avg(s: SparkSession, dir: String): DataFrame =
    st5_scalable(s, dir)

  /** The naive single-partition form of [[st5_running_avg]] — spec-only. */
  private[graft] def st5_running_avg_naive(s: SparkSession, dir: String): DataFrame = {
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
      |WINDOW w AS (ORDER BY epoch_ns(ts) // 1000, event_id ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  /** ST3, EXACT scalable form — unlike [[st3_anomaly_scalable]] (which is
    * deliberately bucket-granular: each event vs completed-bucket prefixes),
    * this is the identical-result decomposition of the exact per-event
    * prior mean: prefix of per-bucket totals + an EXCLUDE-CURRENT
    * intra-bucket window partitioned by bucket. Shares [[st3Sql]]
    * verbatim — with this, every global sequential fold in the engine has
    * an identical-result parallel form. */
  def st3_exact_scalable(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("bucket", (unix_timestamp(col("ts")) / lit(3600L)).cast("long"))
    val perBucket = ev.groupBy(col("bucket"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("bsum"), count(lit(1)).as("bcnt"))
    val prior = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .withColumn("psum", sum(col("bsum")).over(prior))
      .withColumn("pcnt", sum(col("bcnt")).over(prior))
      .select(col("bucket"), col("psum"), col("pcnt"))
    val intra = Window.partitionBy(col("bucket"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.join(broadcast(prefix), Seq("bucket"))
      .withColumn("priorSum",
        coalesce(col("psum"), lit(0).cast("decimal(18,6)"))
          + coalesce(sum(col("value").cast("decimal(18,6)")).over(intra),
                     lit(0).cast("decimal(18,6)")))
      .withColumn("priorCnt", coalesce(col("pcnt"), lit(0L)) + count(lit(1)).over(intra))
      .withColumn("run_avg",
        when(col("priorCnt") > 0, col("priorSum").cast("double") / col("priorCnt")))
      .filter(col("run_avg").isNotNull && col("value") > lit(2.0) * col("run_avg"))
      .select(col("event_id"), col("user_id"), col("value"),
              round4(col("run_avg")).as("run_avg"))
      .orderBy("event_id")
  }

  /** ST5, scalable form with IDENTICAL results — the same exact two-pass
    * decomposition as [[st6_scalable]] (running sum/count are associative):
    * per-hour-bucket totals + prefix window over bucket totals + an
    * INCLUDE-CURRENT intra-bucket window partitioned by bucket. Shares
    * [[st5Sql]] verbatim. */
  def st5_scalable(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("ts"), col("value"))
      .withColumn("bucket", (unix_timestamp(col("ts")) / lit(3600L)).cast("long"))
    val perBucket = ev.groupBy(col("bucket"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("bsum"), count(lit(1)).as("bcnt"))
    val prior = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .withColumn("psum", sum(col("bsum")).over(prior))
      .withColumn("pcnt", sum(col("bcnt")).over(prior))
      .select(col("bucket"), col("psum"), col("pcnt"))
    val intra = Window.partitionBy(col("bucket"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ev.join(broadcast(prefix), Seq("bucket"))
      .withColumn("run_avg", round4(
        (coalesce(col("psum"), lit(0).cast("decimal(18,6)"))
           + sum(col("value").cast("decimal(18,6)")).over(intra)).cast("double")
          / (coalesce(col("pcnt"), lit(0L)) + count(lit(1)).over(intra))))
      .select(col("event_id"), col("value"), col("run_avg"))
      .orderBy("event_id")
  }

  /** The five feature columns the conditional signature tracks, with their
    * `reasons` bitmask bit. */
  private val sigFeatures: Seq[(String, Int)] = Seq(
    "freq" -> 1, "comment_len" -> 2, "post_len" -> 4,
    "comment_ratio" -> 8, "post_ratio" -> 16)

  /** Given a feature frame carrying `avg_<f>` running means, apply the
    * reference's `isNormal` thresholds (AnomalousUserDetector.java:188-200):
    * frequency is abnormal above 2× its mean; lengths and ratios are abnormal
    * OUTSIDE [0.5×, 2×] their mean — each check skipped when the feature is
    * its −1 sentinel. Emits flagged events with a `reasons` bitmask of which
    * checks fired. */
  private def flagAbnormal(f: DataFrame): DataFrame = {
    def band(c: String, bit: Int) = when(col(c) =!= -1 &&
      (col(c) < col(s"avg_$c") * 0.5 || col(c) > col(s"avg_$c") * 2), lit(bit)).otherwise(lit(0))
    val reasons =
      when(col("freq") =!= -1.0 && col("freq") > col("avg_freq") * 2, lit(1)).otherwise(lit(0)) +
      band("comment_len", 2) + band("post_len", 4) +
      band("comment_ratio", 8) + band("post_ratio", 16)
    f.withColumn("reasons", reasons)
      .filter(col("reasons") > 0)
      .withColumn("freq", when(col("freq") === -1.0, lit(-1.0)).otherwise(round4(col("freq"))))
      .withColumn("comment_ratio",
        when(col("comment_ratio") === -1.0, lit(-1.0)).otherwise(round4(col("comment_ratio"))))
      .withColumn("post_ratio",
        when(col("post_ratio") === -1.0, lit(-1.0)).otherwise(round4(col("post_ratio"))))
      .select(col("event_id"), col("user_id"), col("freq"), col("comment_len"),
              col("post_len"), col("comment_ratio"), col("post_ratio"), col("reasons"))
      .orderBy("event_id")
  }

  /** ST6 UnusualUserDetector, full reference fidelity: the global signature
    * is the SENTINEL-AWARE running mean of each of the five features
    * (Signatures.update skips −1-valued features,
    * AnomalousUserDetector.java:160-185), updated BEFORE the normality check
    * (`:268-272` — so each mean INCLUDES the current activity), then the
    * five isNormal threshold checks (`:188-200`). Exact sequential fold in
    * global (ts, event_id) order — the declared non-scalable exact form;
    * [[st6_scalable]] is the identical-result two-pass decomposition.
    *
    * Documented divergence: the reference accumulates the length means in
    * Java INTEGER arithmetic (truncating at every step,
    * AnomalousUserDetector.java:165-175); this engine uses exact decimal
    * sums — the mathematically-intended mean, identical across engines.
    *
    * Executes as the identical-result bucket decomposition
    * ([[st6_scalable]]) — the conditional running sums/counts are
    * associative, so the plans agree bit-for-bit; the naive
    * single-partition fold ([[st6_naive]]) stays as the spec-level
    * cross-check. */
  def st6_conditional_signature(s: SparkSession, dir: String): DataFrame =
    st6_scalable(s, dir)

  /** The naive single-partition form of [[st6_conditional_signature]] —
    * spec-only. */
  private[graft] def st6_naive(s: SparkSession, dir: String): DataFrame = {
    val run = globalOrder.rowsBetween(Window.unboundedPreceding, 0)
    val withMeans = sigFeatures.foldLeft(withFeatures(s, dir)) { case (df, (c, _)) =>
      df.withColumn(s"avg_$c",
        sum(when(col(c) =!= -1, col(c).cast("decimal(30,10)"))).over(run).cast("double")
          / count(when(col(c) =!= -1, lit(1))).over(run))
    }
    flagAbnormal(withMeans)
  }

  /** Shared tail of the two st6 oracle forms: threshold checks + bitmask +
    * output projection over a `sig` CTE carrying features and avg_* means. */
  private val st6TailSql: String =
    """flagged AS (
      |  SELECT event_id, user_id, freq, comment_len, post_len, comment_ratio, post_ratio,
      |    (CASE WHEN freq <> -1.0 AND freq > avg_freq * 2 THEN 1 ELSE 0 END
      |     + CASE WHEN comment_len <> -1 AND (comment_len < avg_comment_len * 0.5
      |            OR comment_len > avg_comment_len * 2) THEN 2 ELSE 0 END
      |     + CASE WHEN post_len <> -1 AND (post_len < avg_post_len * 0.5
      |            OR post_len > avg_post_len * 2) THEN 4 ELSE 0 END
      |     + CASE WHEN comment_ratio <> -1.0 AND (comment_ratio < avg_comment_ratio * 0.5
      |            OR comment_ratio > avg_comment_ratio * 2) THEN 8 ELSE 0 END
      |     + CASE WHEN post_ratio <> -1.0 AND (post_ratio < avg_post_ratio * 0.5
      |            OR post_ratio > avg_post_ratio * 2) THEN 16 ELSE 0 END) AS reasons
      |  FROM sig)
      |SELECT event_id, user_id,
      |  CASE WHEN freq = -1.0 THEN -1.0 ELSE floor(freq * 10000.0 + 0.5) / 10000.0 END AS freq,
      |  comment_len, post_len,
      |  CASE WHEN comment_ratio = -1.0 THEN -1.0
      |       ELSE floor(comment_ratio * 10000.0 + 0.5) / 10000.0 END AS comment_ratio,
      |  CASE WHEN post_ratio = -1.0 THEN -1.0
      |       ELSE floor(post_ratio * 10000.0 + 0.5) / 10000.0 END AS post_ratio,
      |  reasons
      |FROM flagged WHERE reasons > 0 ORDER BY event_id""".stripMargin

  val st6Sql: String = {
    val means = sigFeatures.map { case (c, _) =>
      s"""    sum(CASE WHEN $c <> -1 THEN $c::DECIMAL(30,10) END) OVER g::DOUBLE
         |      / count(CASE WHEN $c <> -1 THEN 1 END) OVER g AS avg_$c""".stripMargin
    }.mkString(",\n")
    s"""WITH $featSql, sig AS (
      |  SELECT event_id, user_id, freq, comment_len, post_len, comment_ratio, post_ratio,
      |$means
      |  FROM feat WINDOW g AS (ORDER BY epoch_ns(ts) // 1000, event_id ROWS UNBOUNDED PRECEDING)),
      |$st6TailSql""".stripMargin
  }

  /** ST6, scalable form with IDENTICAL results: the running conditional
    * sums/counts are associative, so the global sequential fold decomposes
    * EXACTLY into (a) per-hour-bucket conditional totals (one small shuffle),
    * (b) an unbounded prefix window over bucket totals (thousands of rows,
    * not billions), and (c) an intra-bucket running window PARTITIONED by
    * bucket (parallel across buckets) — running mean at row i =
    * (prefix(bucket−1) + intra(≤i)) / (prefix count + intra count). Unlike
    * st3's bucket-granular variant this is not an approximation: it shares
    * [[st6Sql]] verbatim. This is the shape the exact fold takes at 100 TB. */
  def st6_scalable(s: SparkSession, dir: String): DataFrame = {
    val ev = withFeatures(s, dir)
      .withColumn("bucket", (unix_timestamp(col("ts")) / lit(3600L)).cast("long"))
    val bucketAggs = sigFeatures.flatMap { case (c, _) => Seq(
      sum(when(col(c) =!= -1, col(c).cast("decimal(30,10)"))).as(s"bsum_$c"),
      count(when(col(c) =!= -1, lit(1))).as(s"bcnt_$c")) }
    val perBucket = ev.groupBy(col("bucket")).agg(bucketAggs.head, bucketAggs.tail: _*)
    val prior = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = sigFeatures.foldLeft(perBucket) { case (df, (c, _)) =>
      df.withColumn(s"psum_$c", sum(col(s"bsum_$c")).over(prior))
        .withColumn(s"pcnt_$c", sum(col(s"bcnt_$c")).over(prior))
    }.select(col("bucket") +: sigFeatures.flatMap { case (c, _) =>
      Seq(col(s"psum_$c"), col(s"pcnt_$c")) }: _*)
    val intra = Window.partitionBy(col("bucket"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withMeans = sigFeatures.foldLeft(ev.join(broadcast(prefix), Seq("bucket"))) {
      case (df, (c, _)) =>
        val isum = sum(when(col(c) =!= -1, col(c).cast("decimal(30,10)"))).over(intra)
        val icnt = count(when(col(c) =!= -1, lit(1))).over(intra)
        df.withColumn(s"avg_$c",
          (coalesce(col(s"psum_$c"), lit(0).cast("decimal(30,10)")) + isum).cast("double")
            / (coalesce(col(s"pcnt_$c"), lit(0L)) + icnt))
    }
    flagAbnormal(withMeans)
  }

  /** ST7 per-user exponential moving average — the decayed-memory variant
    * of st5's running mean (α = 1/2): ewma₀ = x₀, ewmaᵢ = (ewmaᵢ₋₁ + xᵢ)/2.
    * An EWMA is NOT associative (unlike sums/counts it has no two-pass
    * decomposition), so the per-key sequential fold is inherent; what keeps
    * it scale-safe is that the fold runs per USER over that user's own
    * bounded history — one `collect_list` + in-row `aggregate` fold per
    * key, one shuffle total, state O(per-user events) exactly like the
    * reference's per-key ValueState ops.
    *
    * Cross-engine exactness with no floating point: values quantize to
    * integer cents up front, and each step is `(acc + x) >> 1` — the
    * floor-halving of non-negative longs, identical to the oracle's
    * `(acc + x) // 2` inside DuckDB's `list_reduce`. */
  def st7_ewma(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
              floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           aggregate(
             transform(array_sort(collect_list(struct(col("t"), col("event_id"), col("cents")))),
                       x => x.getField("cents")),
             lit(-1L),
             (acc, x) => when(acc < 0, x).otherwise(shiftright(acc + x, 1)))
             .as("ewma_cents"))
      .orderBy("user_id")
  }

  val st7Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  list_reduce(list(floor(value * 100.0 + 0.5)::BIGINT ORDER BY epoch_ns(ts) // 1000, event_id),
      |              (acc, x) -> (acc + x) // 2) AS ewma_cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** ST8 robust per-user outlier detection — median + MAD (median absolute
    * deviation) instead of the mean/σ signature of st3: the robust scale
    * estimator that a heavy-tailed 100 TB event stream needs, since a single
    * extreme value shifts a mean but not a median.
    *
    * Cross-engine exactness: values quantize to an integer micro-grid
    * (`floor(value·10⁶)`), and both medians are LOWER medians selected by
    * row_number rank — never interpolated, so no engine-specific floating
    * interpolation (`(a+b)/2` vs `a+(b−a)·0.5`) can diverge. Plan: two
    * windowed passes + the final aggregation, ALL partitioned by user_id —
    * one shuffle total, Exchange reused across the window and agg stages. */
  def st8_mad_outliers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
              floor(col("value") * 1000000.0).cast("long").as("x"))
    val wx = Window.partitionBy(col("user_id")).orderBy(col("x"), col("event_id"))
    val n = Window.partitionBy(col("user_id"))
    val ranked = ev
      .withColumn("rn", row_number().over(wx))
      .withColumn("n", count(lit(1)).over(n))
    val med = ranked.filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("user_id"), col("x").as("med"))
    val dev = ev.join(med, Seq("user_id"))
      .withColumn("dev", abs(col("x") - col("med")))
    val wd = Window.partitionBy(col("user_id")).orderBy(col("dev"), col("event_id"))
    val mad = dev
      .withColumn("rn", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(n))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("user_id"), col("dev").as("mad"))
    dev.join(mad, Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           first(col("med")).as("med_micro"),
           first(col("mad")).as("mad_micro"),
           sum(when(col("dev") > lit(3L) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy("user_id")
  }

  val st8Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, floor(value * 1000000.0)::BIGINT AS x
      |  FROM events),
      |r AS (
      |  SELECT user_id, x,
      |    row_number() OVER (PARTITION BY user_id ORDER BY x, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM ev),
      |med AS (SELECT user_id, x AS med FROM r WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT ev.user_id, ev.event_id, abs(ev.x - med.med) AS dv, med.med
      |  FROM ev JOIN med USING (user_id)),
      |rd AS (
      |  SELECT user_id, dv,
      |    row_number() OVER (PARTITION BY user_id ORDER BY dv, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM dev),
      |mad AS (SELECT user_id, dv AS mad FROM rd WHERE rn = (n + 1) // 2)
      |SELECT user_id, count(*) AS n_events,
      |  any_value(med) AS med_micro, any_value(mad) AS mad_micro,
      |  sum(CASE WHEN dv > 3 * mad THEN 1 ELSE 0 END)::BIGINT AS n_outliers
      |FROM dev JOIN mad USING (user_id)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ST9 correlation aggregate — per-user Pearson correlation between spend
    * and hour-of-day (the time-of-day pattern signal next to st3's
    * magnitude signature). Built from the five raw moment sums instead of
    * `corr()`: the builtin accumulates doubles (merge-order-dependent at
    * cluster scale), while integer-grid moment sums are EXACT under any
    * partitioning. The moments accumulate in DECIMAL (Spark) / HUGEINT
    * (DuckDB) — exact wide-integer arithmetic in both engines, so
    * n·Σx²−(Σx)² cannot silently wrap however many events a key has; the
    * only floating ops are the final two sqrts and one division, identical
    * IEEE in both engines. One shuffle on user_id. */
  def st9_corr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
        col("user_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("x"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("y"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
           sum(col("x").cast("decimal(20,0)")).as("sx"),
           sum(col("y").cast("decimal(20,0)")).as("sy"),
           sum((col("x") * col("y")).cast("decimal(20,0)")).as("sxy"),
           sum((col("x") * col("x")).cast("decimal(20,0)")).as("sxx"),
           sum((col("y") * col("y")).cast("decimal(20,0)")).as("syy"))
      .withColumn("dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("dy", col("n") * col("syy") - col("sy") * col("sy"))
      .select(col("user_id"), col("n"),
        when(col("dx") > 0 && col("dy") > 0,
          round4((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                 (sqrt(col("dx").cast("double")) * sqrt(col("dy").cast("double")))))
          .as("corr_spend_hour")) // zero-variance user ⇒ undefined ⇒ null
      .orderBy("user_id")
  }

  val st9Sql: String =
    """WITH ev AS (
      |  SELECT user_id, floor(value * 100.0 + 0.5)::BIGINT AS x,
      |         ((epoch_ns(ts) // 1000) // 3600000000) % 24 AS y
      |  FROM events),
      |m AS (
      |  SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM ev GROUP BY 1)
      |SELECT user_id, n,
      |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
      |    floor((n * sxy - sx * sy)::DOUBLE /
      |          (sqrt((n * sxx - sx * sx)::DOUBLE) * sqrt((n * syy - sy * sy)::DOUBLE))
      |          * 10000.0 + 0.5) / 10000.0
      |  END AS corr_spend_hour
      |FROM m ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st9_corr"              -> (st9_corr _),
    "st8_mad_outliers"      -> (st8_mad_outliers _),
    "st7_ewma"              -> (st7_ewma _),
    "st6_conditional_signature" -> (st6_conditional_signature _),
    "st6_scalable"          -> (st6_scalable _),
    "st2_user_features"     -> (st2_user_features _),
    "st3_anomaly_exact"     -> (st3_anomaly_exact _),
    "st3_anomaly_scalable"  -> (st3_anomaly_scalable _),
    "st3_exact_scalable"    -> (st3_exact_scalable _),
    "st4_running_user_sum"  -> (st4_running_user_sum _),
    "st5_running_avg"       -> (st5_running_avg _),
    "st5_scalable"          -> (st5_scalable _))

  val oracles: Map[String, String] = Map(
    "st9_corr"              -> st9Sql,
    "st8_mad_outliers"      -> st8Sql,
    "st7_ewma"              -> st7Sql,
    "st6_conditional_signature" -> st6Sql,
    "st6_scalable"          -> st6Sql,
    "st2_user_features"     -> st2Sql,
    "st3_anomaly_exact"     -> st3Sql,
    "st3_anomaly_scalable"  -> st3ScalableSql,
    "st3_exact_scalable"    -> st3Sql,
    "st4_running_user_sum"  -> st4Sql,
    "st5_running_avg"       -> st5Sql,
    "st5_scalable"          -> st5Sql)
}
