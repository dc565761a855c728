package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared numeric helpers for cross-engine (Spark ↔ DuckDB oracle) parity. */
object QUtil {
  /** Round-half-up as pure double arithmetic (`floor(x·10ⁿ+0.5)/10ⁿ`).
    * Unlike `round()` — which Spark evaluates on the decimal string
    * representation and DuckDB on the binary value, disagreeing on exact
    * .5-boundary quotients — this is the same IEEE op sequence in both
    * engines, hence bit-identical. The matching oracle-SQL form is
    * `floor(x * 10000.0 + 0.5) / 10000.0`. */
  def round4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
  def round2(c: Column): Column = floor(c * lit(100.0) + lit(0.5)) / lit(100.0)
}
