package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import QUtil._

/** The reference's full friend-recommendation pipeline (Task 2 —
  * FriendRecommender.java, SURVEY.md §2.4 W5-W7, §2.5 J2-J3) re-expressed
  * over the driver's `events` table:
  *
  *   1. W5: per (4h/1h sliding window, item, user) activity counts — the
  *      "user-activity map" pane; item parsed from `props`, "eigen" users =
  *      user_id ≡ 0 (mod 50) (the reference restricts to 10 eigen users,
  *      FriendRecommender.java:123-155).
  *   2. W5 finisher / W6: dynamic similarity = Σ_item eigenCnt·otherCnt via
  *      equi-join on (window, item) — the reference's hand-built
  *      Map<user,count> product becomes a join + sum.
  *   3. J2: already-friends excluded by broadcast LEFT ANTI join (here the
  *      deterministic relation friend(e, e+1), friend(e, e+2)).
  *   4. J3: static similarity = |shared distinct items| via a second
  *      equi-join on the high-cardinality item key (the reference joins
  *      object tables, FriendRecommender.java:158-210).
  *   5. W7/F6: per (window, eigen) min-max normalization of both scores
  *      (degenerate span ⇒ 1.0, FriendRecommender.java:346-354), blend
  *      0.3·static + 0.7·dynamic (Config.java:83), top-5 by `row_number`.
  *
  * Scale notes: every step is an equi-join or windowed agg — one shuffle per
  * key change, map-side partial aggs throughout; the friends and static-sim
  * sides are broadcast. The eigen restriction is applied BEFORE the pair
  * join, so the join's left side is ~1/50 of users. At 100 TB the pane join
  * would additionally pre-partition both sides by (window, item) bucketing.
  */
object Recommend {

  private def acts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("user_id"),
      regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("item"),
      col("ts"))

  /** R1: windowed hybrid top-5 recommendations. Output one row per
    * (window, eigen, rank). */
  def r1_friend_recs(s: SparkSession, dir: String): DataFrame = {
    val ev = acts(s, dir)
    // W5: per-pane per-item per-user activity counts — materialized once
    // (referenced as both join sides of the similarity product)
    val pane = ev
      .groupBy(window(col("ts"), "4 hours", "1 hour"), col("item"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
              col("item"), col("user_id"), col("cnt"))
      .localCheckpoint()
    val eigen = pane.filter(col("user_id") % 50 === 0)
      .select(col("win_start"), col("item"),
              col("user_id").as("eigen_id"), col("cnt").as("ecnt"))
    // dynamic similarity: join on (window, item), product-sum
    val dyn = eigen.join(pane, Seq("win_start", "item"))
      .filter(col("user_id") =!= col("eigen_id"))
      .groupBy(col("win_start"), col("eigen_id"), col("user_id"))
      .agg(sum(col("ecnt") * col("cnt")).as("dyn"))
    // J2: exclude already-friends (deterministic relation e -> {e+1, e+2})
    val friends = Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id").as("eigen_id"),
              explode(array(col("user_id") + 1, col("user_id") + 2)).as("user_id"))
    val cand = dyn.join(broadcast(friends), Seq("eigen_id", "user_id"), "left_anti")
    // J3: static similarity = |shared distinct items|, keyed on the
    // high-cardinality item key (the reference's static sim joins four
    // object tables, FriendRecommender.java:158-210) — NEVER on a 5-value
    // enum, which is a quadratic hot-key blowup at scale. The pair table is
    // unbounded, so no broadcast hint: let the join shuffle on its keys.
    val items = ev.select(col("user_id"), col("item")).distinct()
    val stat = items.select(col("user_id").as("eigen_id"), col("item"))
      .filter(col("eigen_id") % 50 === 0)
      .join(items, Seq("item"))
      .filter(col("user_id") =!= col("eigen_id"))
      .groupBy(col("eigen_id"), col("user_id"))
      .agg(count(lit(1)).cast("double").as("stat"))
    val scored = cand.join(stat, Seq("eigen_id", "user_id"), "left")
      .na.fill(0.0, Seq("stat"))
    // W7: min-max normalize within (window, eigen); degenerate span -> 1.0
    val w = Window.partitionBy(col("win_start"), col("eigen_id"))
    def mm(c: String) = {
      val (mn, mx) = (min(col(c)).over(w), max(col(c)).over(w))
      when(mx === mn, 1.0).otherwise((col(c) - mn) / (mx - mn))
    }
    scored
      .withColumn("score", round4(lit(0.3) * mm("stat") + lit(0.7) * mm("dyn")))
      .withColumn("rank", row_number().over(
        w.orderBy(col("score").desc, col("user_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("win_start"), col("eigen_id"), col("user_id").as("cand_id"),
              col("score"), col("rank"))
      .orderBy("win_start", "eigen_id", "rank")
  }

  val r1Sql: String =
    """WITH ev AS (
      |  SELECT user_id, regexp_extract(props, '[0-9]+')::BIGINT AS item, ts FROM events
      |), pane AS (
      |  SELECT floor(epoch(time_bucket(INTERVAL '1 hour', ts)))::BIGINT - 3600 * k AS win_start,
      |         item, user_id, count(*) AS cnt
      |  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k)
      |  GROUP BY 1, 2, 3
      |), dyn AS (
      |  SELECT e.win_start, e.user_id AS eigen_id, p.user_id AS user_id,
      |         sum(e.cnt * p.cnt)::BIGINT AS dyn
      |  FROM pane e JOIN pane p ON e.win_start = p.win_start AND e.item = p.item
      |  WHERE e.user_id % 50 = 0 AND p.user_id <> e.user_id
      |  GROUP BY 1, 2, 3
      |), cand AS (
      |  SELECT * FROM dyn d
      |  WHERE d.user_id <> d.eigen_id + 1 AND d.user_id <> d.eigen_id + 2
      |), items AS (
      |  SELECT DISTINCT user_id, item FROM ev
      |), stat AS (
      |  SELECT a.user_id AS eigen_id, b.user_id AS user_id, count(*)::DOUBLE AS stat
      |  FROM items a JOIN items b ON a.item = b.item AND a.user_id <> b.user_id
      |  WHERE a.user_id % 50 = 0
      |  GROUP BY 1, 2
      |), scored AS (
      |  SELECT c.win_start, c.eigen_id, c.user_id, c.dyn,
      |         coalesce(s.stat, 0.0) AS stat
      |  FROM cand c LEFT JOIN stat s ON s.eigen_id = c.eigen_id AND s.user_id = c.user_id
      |), norm AS (
      |  SELECT win_start, eigen_id, user_id,
      |    CASE WHEN max(stat) OVER w = min(stat) OVER w THEN 1.0
      |         ELSE (stat - min(stat) OVER w) / (max(stat) OVER w - min(stat) OVER w) END AS stat_n,
      |    CASE WHEN max(dyn) OVER w = min(dyn) OVER w THEN 1.0
      |         ELSE (dyn - min(dyn) OVER w)::DOUBLE / (max(dyn) OVER w - min(dyn) OVER w) END AS dyn_n
      |  FROM scored WINDOW w AS (PARTITION BY win_start, eigen_id)
      |), ranked AS (
      |  SELECT win_start, eigen_id, user_id AS cand_id,
      |    floor((0.3 * stat_n + 0.7 * dyn_n) * 10000.0 + 0.5) / 10000.0 AS score,
      |    row_number() OVER (PARTITION BY win_start, eigen_id
      |      ORDER BY floor((0.3 * stat_n + 0.7 * dyn_n) * 10000.0 + 0.5) / 10000.0 DESC,
      |               user_id) AS rank
      |  FROM norm)
      |SELECT win_start, eigen_id, cand_id, score, rank FROM ranked
      |WHERE rank <= 5 ORDER BY win_start, eigen_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_friend_recs" -> (r1_friend_recs _))

  val oracles: Map[String, String] = Map(
    "r1_friend_recs" -> r1Sql)
}
