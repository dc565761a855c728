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

  test("packShards = brute-force chunking on seeded-random curricula (c18)") {
    // The shard-packing analog of C19FoldPropertySpec's brute-force pin:
    // random curriculum shapes — non-dense stage ids, shuffled in-stage
    // ranks, token counts spanning multiple 128-token shards — through
    // the shipped packShards body vs plain local chunk arithmetic.
    import spark.implicits._
    val L = 128L
    val rnd = new scala.util.Random(4242)
    for (iter <- 1 to 25) {
      val stages = rnd.shuffle((0L to 9L).toList).take(1 + rnd.nextInt(4))
      val cur = stages.flatMap { st =>
        val n = 1 + rnd.nextInt(12)
        val ranks = rnd.shuffle((1L to n.toLong).toList)
        ranks.zipWithIndex.map { case (rk, i) =>
          (st * 1000L + i, st, rk, 1L + rnd.nextInt(300).toLong)
        }
      }
      val got = graft.queries.Pipeline.packShards(
          cur.toDF("doc_id", "stage", "rank_in_stage", "n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val exp = cur.groupBy(_._2).flatMap { case (st, docs) =>
        val inOrder = docs.sortBy(_._3)
        val total = inOrder.map(_._4).sum
        val offs = inOrder.map(_._4).scanLeft(0L)(_ + _)
        inOrder.zip(offs).flatMap { case ((_, _, _, nt), off) =>
          (off / L) to ((off + nt - 1) / L) map { sh =>
            (st, sh, if (off / L == sh) 1L else 0L)
          }
        }.groupBy { case (_, sh, _) => sh }.map { case (sh, rows) =>
          (st, sh) -> (math.min(L, total - sh * L),
                       rows.size.toLong, rows.map(_._3).sum)
        }
      }.toMap
      assert(got === exp, s"iter=$iter stages=$stages diverged\ncur=$cur")
    }
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
