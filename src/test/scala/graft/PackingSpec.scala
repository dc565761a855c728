package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.TextAnalysis

/** Pins t19's scale-safe packing manifest against the naive
  * global-sort-window spelling it replaces: the bucketed two-phase prefix
  * sum must produce byte-identical chunk stats to `sum() OVER (ORDER BY
  * doc_id)` — and the result must be invariant to how the input is
  * partitioned (the property the bucket decomposition is FOR).
  */
class PackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed packing equals the naive global-window form") {
    val L = 128L
    val naive = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("off", coalesce(sum(col("n_tok")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("off"), col("n_tok"),
              explode(sequence(expr(s"off div $L"),
                               expr(s"(off + n_tok - 1) div $L"))).as("chunk_id"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(expr(s"off div $L") === col("chunk_id"), 1L)
             .otherwise(0L)).as("n_starts"))
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val packed = TextAnalysis.t19_sequence_packing(spark, dir)
      .select("chunk_id", "n_docs", "n_starts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toSeq == naive.toSeq)
  }

  test("packing manifest invariants: full chunks, contiguous ids, boundary counts") {
    val rows = TextAnalysis.t19_sequence_packing(spark, dir).collect()
    val ids = rows.map(_.getLong(0))
    assert(ids.toSeq == (0L until rows.length).toSeq) // contiguous
    // all chunks full except possibly the last
    assert(rows.dropRight(1).forall(_.getLong(1) == 128L))
    assert(rows.last.getLong(1) <= 128L && rows.last.getLong(1) > 0L)
    // every document starts in exactly one chunk
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(3)).sum == nDocs)
  }
}
