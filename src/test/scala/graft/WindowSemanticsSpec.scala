package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Window alignment + session-gap semantics against hand-computed fixtures
  * (SURVEY.md §7.3: Flink aligns windows to epoch multiples of the slide;
  * Spark must agree on UTC data). */
class WindowSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("tumbling windows align to epoch multiples") {
    val df = Seq(
      (1L, ts("2024-01-01T00:29:59Z")),
      (2L, ts("2024-01-01T00:30:00Z")),
      (3L, ts("2024-01-01T00:59:59Z"))).toDF("id", "ts")
    val w = df.groupBy(window(col("ts"), "30 minutes")).count()
      .select(unix_timestamp(col("window.start")).as("start"), col("count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 00:00-00:30 holds id 1; 00:30-01:00 holds ids 2,3 (start inclusive)
    assert(w == Map(1704067200L -> 1L, 1704069000L -> 2L))
  }

  test("sliding windows emit one row per covering pane") {
    val df = Seq((1L, ts("2024-01-01T05:15:00Z"))).toDF("id", "ts")
    val w = df.groupBy(window(col("ts"), "6 hours", "1 hour")).count()
    // a point belongs to exactly duration/slide = 6 sliding windows
    assert(w.count() == 6)
    val starts = w.select(unix_timestamp(col("window.start"))).as[Long].collect().sorted
    // earliest window starts 5h before the hour containing the event
    assert(starts.head == java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond)
    assert(starts.last == java.time.Instant.parse("2024-01-01T05:00:00Z").getEpochSecond)
  }

  test("session windows split on gap >= 30 minutes") {
    val df = Seq(
      (7L, ts("2024-01-01T00:00:00Z")),
      (7L, ts("2024-01-01T00:20:00Z")), // 20 min gap: same session
      (7L, ts("2024-01-01T01:00:00Z")), // 40 min gap: new session
      (8L, ts("2024-01-01T00:10:00Z"))) // different key: own session
      .toDF("user_id", "ts")
    val sess = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_timestamp(col("session_window.start")).as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sess == Set(
      (7L, 1704067200L, 2L), // 00:00 session with 2 events
      (7L, 1704070800L, 1L), // 01:00 session
      (8L, 1704067800L, 1L)))
  }

  test("window alignment law: start = ts - ts mod slide (epoch arithmetic)") {
    // mirrors SlidingWindowEvaluator.java:22-25's alignment
    val events = Seq(0L, 1L, 1799L, 1800L, 3599L, 86400L, 90000L)
    val df = events.map(e => Tuple1(new Timestamp(e * 1000L))).toDF("ts")
    val got = df.select(
        unix_timestamp(col("ts")).as("t"),
        unix_timestamp(window(col("ts"), "30 minutes").getField("start")).as("start"))
      .collect()
    got.foreach { r =>
      val (t, start) = (r.getLong(0), r.getLong(1))
      assert(start == t - t % 1800L, s"ts=$t")
    }
  }

  test("sliding alignment law holds for arbitrary width/slide pairs (property)") {
    // The epoch-alignment law independent of testdata
    // (SlidingWindowEvaluator.java:22-25): an event at epoch second t
    // under window(width = k·s, slide = s) lands in EXACTLY k panes whose
    // starts are t − t%s − i·s for i = 0..k−1 — i.e. every covering pane
    // start is ≡ 0 (mod s), the latest is t's own slide-aligned pane, and
    // coverage (start ≤ t < start + width) is tight. One Spark job checks
    // 60 generated (slide, k, events) triples.
    import org.scalacheck.Gen
    val caseGen = for {
      s <- Gen.chooseNum(1, 7200)   // slide seconds
      k <- Gen.chooseNum(1, 8)      // width = k slides
      t <- Gen.chooseNum(0L, 4L * 365 * 86400) // event epoch second
    } yield (s, k, t)
    val cases = Gen.listOfN(60, caseGen).sample.get.distinct
    cases.zipWithIndex.foreach { case ((s, k, t), cid) =>
      val df = Seq(Tuple1(new Timestamp(t * 1000L))).toDF("ts")
      val starts = df
        .select(unix_timestamp(
          window(col("ts"), s"${k.toLong * s} seconds", s"$s seconds")
            .getField("start")).as("start"))
        .as[Long].collect().sorted
      val expected = (0 until k).map(i => t - t % s - i.toLong * s).sorted
      assert(starts.toSeq == expected,
        s"case $cid: slide=$s k=$k t=$t got ${starts.toSeq} want $expected")
    }
  }
}
