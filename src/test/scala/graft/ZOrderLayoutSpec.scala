package graft

import org.apache.spark.sql.functions._

/** Z-order (Morton) layout as the multi-dimensional pruning primitive: a
  * linear sort clusters only its leading column, so a range predicate on any
  * OTHER dimension touches every file; interleaving the dimension bits
  * (`interleave_bits`) bounds the files any 2-D box query touches. This spec
  * measures the real effect on parquet files — the same locality min/max
  * row-group pruning exploits at 100 TB.
  */
class ZOrderLayoutSpec extends SparkSpec {

  test("z-ordered layout confines a box query to few files; linear layout does not") {
    graft.functions.InterleaveBits.register(spark)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"),
        (col("event_id") % 1024).as("tbucket"))
      .withColumn("z", expr("interleave_bits(user_id, tbucket)"))

    val zDir = java.nio.file.Files.createTempDirectory("graft_zord_").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_linear_").toString
    ev.repartitionByRange(16, col("z")).write.mode("overwrite").parquet(zDir)
    ev.repartitionByRange(16, col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(xDir)

    // box predicate on the NON-leading dimension of the linear layout
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir).filter(col("tbucket") < 64)
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(zDir)
    val xFiles = filesTouched(xDir)
    assert(xFiles >= 12, s"linear layout should scatter the box over ~all 16 files, got $xFiles")
    assert(zFiles <= 4, s"z-order should confine the box to few files, got $zFiles")
  }

  test("morton spread is exact and order-preserving per dimension") {
    import graft.functions.InterleaveBits.{morton, spread}
    assert(spread(0L) == 0L && spread(1L) == 1L && spread(2L) == 4L && spread(3L) == 5L)
    assert(morton(0L, 1L) == 2L && morton(1L, 0L) == 1L && morton(3L, 3L) == 15L)
    // interleave of 31-bit inputs stays non-negative (sign-safe ordering)
    assert(morton((1L << 31) - 1, (1L << 31) - 1) > 0L)
  }
}
