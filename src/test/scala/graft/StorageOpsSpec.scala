package graft

import org.apache.spark.sql.functions._

/** Storage-maintenance operations a 100 TB table lives or dies by:
  * small-file compaction (a streaming sink's thousands of tiny files →
  * scan-efficient large ones) and schema evolution (yesterday's files
  * lack today's column; the union scan must still plan).
  */
class StorageOpsSpec extends SparkSpec {

  test("compaction: many small files fold into few, content-identical") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val smallDir = java.nio.file.Files.createTempDirectory("graft_small_").toString
    val bigDir = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    // simulate a micro-batch sink: 64 files of ~16 rows each
    ev.repartition(64).write.mode("overwrite").parquet(smallDir)
    val nSmall = new java.io.File(smallDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nSmall == 64, s"expected 64 small files, got $nSmall")

    // the compaction job: one pass, no semantic change — repartition to the
    // target file count and keep event_id clustering for range pruning
    spark.read.parquet(smallDir)
      .repartitionByRange(4, col("event_id"))
      .write.mode("overwrite").parquet(bigDir)
    val nBig = new java.io.File(bigDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nBig == 4, s"expected 4 compacted files, got $nBig")

    // content identical (same rows, nothing lost or duplicated)
    val before = spark.read.parquet(smallDir)
    val after = spark.read.parquet(bigDir)
    assert(after.count() == before.count())
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "compaction changed table content")
  }

  test("schema evolution: old files without the new column still scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"))
    // generation 1: two columns
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    // generation 2: a quality score added by a later pipeline version
    ev.filter(col("event_id") % 2 === 1)
      .withColumn("quality", (col("event_id") % 100).cast("double"))
      .write.mode("append").parquet(dir)

    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.columns.toSet == Set("event_id", "user_id", "quality"))
    // old rows surface with quality null; new rows keep their values
    val n = ev.count()
    assert(unified.count() == n)
    assert(unified.filter(col("quality").isNull).count() == (n + 1) / 2)
    // and the evolved column is filterable (null-safe) across generations
    assert(unified.filter(col("quality") > 50).count() > 0)
  }
}
