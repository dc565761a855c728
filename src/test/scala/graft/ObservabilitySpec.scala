package graft

import java.sql.Timestamp

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Pipeline observability — audit counters must ride the SAME pass as the
  * data, not a second scan. At 100 TB a separate `count()` for a metrics
  * dashboard re-reads the corpus; `observe()` attaches `CollectMetrics` to
  * the existing plan, so every job that materializes the output also
  * delivers its audit row for free (batch via `Observation`, streaming via
  * `StreamingQueryProgress.observedMetrics`). The d12/x22 incremental-dedup
  * pair is the natural carrier: an ingest job publishes docs-seen /
  * dup-rate counters with every increment. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("batch audit counters ride the d12 pass via observe (no extra scan)") {
    val fp = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("h"))
    val obs = Observation("ingest_audit")
    val out = graft.queries.Dedup.incrClassify(
      fp.observe(obs, count(lit(1)).as("docs_seen"),
                 sum((col("doc_id") % 10 === 0).cast("long")).as("delta_seen")))
    val classified = out.collect()
    // the metrics arrived from the SAME action that produced `classified`
    val m = obs.get
    val expectTotal = graft.Tables.documents(spark, dir).count()
    assert(m("docs_seen") == expectTotal)
    assert(m("delta_seen") == classified.length.toLong)
  }

  test("streaming observed metrics surface per-trigger in query progress") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((1L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))),
                (2L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:01:00Z"))),
                (3L, Timestamp.from(java.time.Instant.parse("2024-01-01T00:02:00Z"))))
    val q = mem.toDF().toDF("user_id", "ts")
      .observe("stream_audit", count(lit(1)).as("rows_in"),
               max(col("user_id")).as("max_user"))
      .writeStream.format("memory")
      .queryName(s"obs_mem_${System.nanoTime()}")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val audits = q.recentProgress.toSeq
      .flatMap(p => p.observedMetrics.asScala.get("stream_audit"))
    assert(audits.nonEmpty, "no observed metrics in any trigger's progress")
    assert(audits.map(_.getAs[Long]("rows_in")).sum == 3L)
    assert(audits.map(_.getAs[Long]("max_user")).max == 3L)
  }
}
