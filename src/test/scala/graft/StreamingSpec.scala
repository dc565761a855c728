package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Event-time streaming semantics with controlled out-of-order input via
  * MemoryStream: watermark dropping (L1/L2) and final-value fidelity of the
  * windowed aggregation under bounded out-of-orderness (SURVEY.md §2.6). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("watermarked tumbling agg: late-but-within-bound events still count") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val agg = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: in-order events advance watermark to 02:00 - 30min = 01:30
      mem.addData((1L, ts("2024-01-01T00:10:00Z")), (2L, ts("2024-01-01T02:00:00Z")))
      q.processAllAvailable()
      // batch 2: event at 01:40 is out-of-order but AFTER watermark => kept
      mem.addData((3L, ts("2024-01-01T01:40:00Z")))
      q.processAllAvailable()
      // batch 3: advance watermark past 02:00 to close windows 0 and 1
      mem.addData((4L, ts("2024-01-01T03:00:00Z")))
      q.processAllAvailable()
      val rows = spark.table("wm_test")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // window 00:00 closed with 1 event; window 01:00 closed with the late event
      assert(rows.get(java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond)
        .contains(1L))
      assert(rows.get(java.time.Instant.parse("2024-01-01T01:00:00Z").getEpochSecond)
        .contains(1L))
    } finally q.stop()
  }

  test("streaming sliding agg over bounded replay equals batch result") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streams.x1_sliding_counts(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Windows.w2_sliding_counts(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState running sum equals batch window form") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streams.x2_running_user_sum(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Stateful.st4_running_user_sum(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming resolver equals batch pointer-doubling") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streams.x3_stream_resolver(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Graph.st1_resolve_roots(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
