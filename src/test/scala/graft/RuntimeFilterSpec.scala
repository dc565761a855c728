package graft

import org.apache.spark.sql.functions._

/** Runtime filter injection (the third scale weapon next to manual salting
  * and AQE skew-split): a selective dimension-side predicate is turned into
  * a bloom filter applied to the fact side BEFORE the join shuffle, so fact
  * rows that cannot match never leave the scan stage. Thresholds are
  * lowered so toy data qualifies; the mechanism is what ships at 100 TB. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim predicate injects a bloom filter on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      val dim = Tables.orders(spark, dir)
        .filter(col("o_totalprice") > 450000.0) // selective creation side
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter") || opt.contains("BloomFilter"),
        s"expected a runtime bloom filter in the optimized plan:\n$opt")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
