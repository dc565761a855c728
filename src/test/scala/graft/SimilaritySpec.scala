package graft

import graft.queries.Similarity

/** The `spark.graft.exactDecimals=false` production path (plain-double dot
  * products, several-fold cheaper than the exact-decimal folds) must find
  * the same near-duplicate pairs as the oracle-hashed exact path — the
  * flag trades cross-engine bit-equality for speed, never results. */
class SimilaritySpec extends SparkSpec {

  test("native dot_f32 equals the composed plain-double fold bit-for-bit") {
    graft.functions.DotProduct.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("embedding").as("a"))
    val paired = emb.limit(200).crossJoin(
      emb.limit(7).withColumnRenamed("a", "b"))
    val diff = paired.selectExpr(
      "dot_f32(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS folded")
      .filter("native <> folded").count()
    assert(diff == 0)
  }

  test("native sq_dist production path trains identical k-means centroids") {
    val dir = "/root/testdata/sf0.001"
    val key = "spark.graft.exactDecimals"
    def train(): Seq[(Long, Long, Double)] =
      Similarity.s4_kmeans_train(spark, dir).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = train()
    spark.conf.set(key, "false")
    try {
      // per-dim means stay exact-decimal on both paths, so identical
      // assignments must reproduce the exact path's centroids bit-for-bit
      val fast = train()
      assert(fast == exact)
      assert(exact.nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("plain-double production path finds the same LSH near-dup pairs") {
    val dir = "/root/testdata/sf0.001"
    val key = "spark.graft.exactDecimals"
    def pairs(): Map[(Long, Long), Double] = {
      Similarity.clearShared()
      Similarity.s2_lsh_neardup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val exact = pairs()
    spark.conf.set(key, "false")
    try {
      val fast = pairs()
      assert(fast.keySet == exact.keySet,
        s"pair sets diverge: only-exact=${exact.keySet -- fast.keySet}, " +
          s"only-fast=${fast.keySet -- exact.keySet}")
      val maxDiff = exact.map { case (k, v) => math.abs(fast(k) - v) }.max
      assert(maxDiff <= 1e-4, s"cosine drift $maxDiff exceeds rounding width")
      assert(exact.nonEmpty)
    } finally {
      spark.conf.unset(key)
      Similarity.clearShared()
    }
  }
}
