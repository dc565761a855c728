package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All queries take the sf directory as a parameter so the same code runs at
  * sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1+ (bench).
  * Reads are plain parquet scans: Catalyst pushes filters/projections down to
  * the scan, so callers should NOT pre-materialize or cache here — at 100 TB
  * the scan pruning is the whole ballgame.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(path(dir, name))

  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * only reads with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * Verify/Bench/test sessions). We truncate ns → µs (Spark's native
    * timestamp resolution); all query outputs floor further to whole seconds
    * so the DuckDB oracle (which keeps ns) agrees.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // timezone-naive writers (isAdjustedToUTC=false, e.g. a DuckDB COPY)
      // surface as NTZ; the session runs UTC, so the cast is the identity
      // on wall-clock values
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _        => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
