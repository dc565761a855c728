package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling (SURVEY.md scale patterns): `q8_salted_distinct`
  * is the MANUAL skew weapon (salting); this spec asserts the AUTOMATIC one
  * — adaptive execution detecting a skewed shuffle partition at runtime and
  * splitting it (`skew=true` on the sort-merge join) — so a hot key in a
  * 100 TB join degrades to parallel sub-joins instead of one straggler
  * task. Thresholds are lowered to make toy data look skewed; the mechanism
  * is scale-independent. */
class AdaptiveSkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the adaptive plan)") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key: ~90% of left rows share skew_key = 0. The single-file
      // scan must fan out to many map tasks first — AQE splits a skewed
      // reduce partition by MAPPER ranges, so one mapper = unsplittable.
      val left = Tables.events(spark, "/root/testdata/sf0.01")
        .repartition(12)
        .select(col("event_id"),
          when(col("event_id") % 10 < 9, lit(0L))
            .otherwise(col("event_id")).as("skew_key"),
          col("props"))
      val right = Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id").as("skew_key"), col("value")).distinct()
      val joined = left.join(right, Seq("skew_key"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
