package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** SURVEY §2 row L5: speedup-proportional replay. The reference's producer
  * serves records at a rate proportional to event time — it sleeps
  * `(next − prev) / speedupFactor` wall-time between emissions
  * (`Producer.java:66-73`), with 604800× (one event-time week per wall
  * second) the suggested demo setting. Demo-only in the reference, so here
  * it is a spec, not a query: two micro-batches of the deterministic
  * jittered arrival schedule are replayed at the proportional rate, and the
  * pacing contract + content fidelity are asserted. */
class PacedReplaySpec extends SparkSpec {
  import spark.implicits._

  test("two micro-batches are served one event-time week per wall second apart") {
    val dir = "/root/testdata/sf0.001"
    val arr = graft.queries.Replay.arrivals(spark, dir)
      .select("event_id", "arrival_s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
    val (chunk1, chunk2) = arr.splitAt(arr.length / 2)
    val speedup = 604800L
    val wallStart = System.currentTimeMillis()
    val walls = graft.queries.Replay.pacedWallMillis(
      Seq(chunk1.head._2, chunk2.head._2), speedup, wallStart)
    val pacedGapMs = walls(1) - walls(0)
    // the demo must pace a VISIBLE gap (sf0.001 spans ~4 weeks of event
    // time, so the halves sit >1 paced second apart at 1 wk/s)
    assert(pacedGapMs >= 1000L, s"expected a >=1s paced gap, got ${pacedGapMs}ms")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("event_id").writeStream
      .format("memory").queryName("paced_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(chunk1.map(_._1).toSeq)
      q.processAllAvailable()
      // Producer.java:66-73: sleep until the next record's paced wall time
      val sleepMs = walls(1) - System.currentTimeMillis()
      if (sleepMs > 0) Thread.sleep(sleepMs)
      val servedSecondAt = System.currentTimeMillis()
      mem.addData(chunk2.map(_._1).toSeq)
      q.processAllAvailable()
      // pacing contract: the second batch was not served before its paced
      // wall time, and the full relation arrived intact
      assert(servedSecondAt >= walls(1),
        s"second batch served at $servedSecondAt, paced time was ${walls(1)}")
      assert(spark.table("paced_replay").count() == arr.length)
    } finally q.stop()
  }
}
