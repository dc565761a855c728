package graft

import org.apache.spark.sql.functions._

/** Partition layout as the scan-pruning primitive: a date-partitioned write
  * lets a day-filtered query read ONLY that day's files — at 100 TB the
  * difference between scanning a partition and scanning the corpus. The
  * plan must show the filter consumed as a PartitionFilter (zero data files
  * of other days opened), not a post-scan predicate. */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write prunes the scan to one partition") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val ev = Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").mode("overwrite").parquet(out)
    val days = ev.select("day").distinct().count()
    assert(days > 1, "need multiple partitions for the test to mean anything")

    val someDay = ev.groupBy("day").count().orderBy(desc("count"))
      .select("day").head().getString(0)
    val q = spark.read.parquet(out).filter(col("day") === someDay)
    val expected = ev.filter(col("day") === someDay).count()
    // execute through THIS QueryExecution so the scan metrics are populated
    assert(q.collect().length == expected)

    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    // the day predicate must be a partition filter on the scan...
    assert(meta.contains("PartitionFilters") && meta.contains("day"),
      s"day filter not pushed to partition pruning:\n$meta")
    // ...and the scan must actually read only that partition's files
    val filesRead = scan.metrics.get("numFiles").map(_.value)
    val filesOneDay = new java.io.File(s"$out/day=$someDay")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesRead.contains(filesOneDay.toLong),
      s"scan read ${filesRead} files, expected $filesOneDay (one partition)")
  }
}
