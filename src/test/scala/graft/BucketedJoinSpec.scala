package graft

import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join primitive (SURVEY.md scale patterns):
  * writing both fact tables bucketed + sorted on the join key lets the join
  * read bucket-aligned files directly — NO shuffle exchange in the joined
  * plan. At 100 TB this converts the dominant repeated join cost into a
  * one-time write-layout cost, the standard warehouse co-location play. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(bcast)
    spark.conf.set(bcast, "-1") // force a non-broadcast join to exercise buckets
    try {
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // the same join over raw parquet DOES shuffle — buckets are the cause
      val raw = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
        .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice")),
              col("l_orderkey") === col("o_orderkey"))
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set(bcast, prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
