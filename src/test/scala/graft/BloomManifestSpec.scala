package graft

import org.apache.spark.sql.functions._

/** Bloom filters as explicit data: build a compact membership manifest over
  * one table's keys and pre-filter another table against it — the
  * shuffle-avoiding semi-join shortcut at 100 TB (ship kilobytes of bits
  * instead of shuffling the fact side; survivors get the exact join).
  * `RuntimeFilterSpec` covers Spark injecting these automatically; this
  * spec exercises the aggregate as a first-class operator with its two
  * contracts: NO false negatives ever, false-positive rate within bound.
  */
class BloomManifestSpec extends SparkSpec {

  test("bloom manifest: zero false negatives, bounded false positives") {
    val dir = "/root/testdata/sf0.001"
    // the builder/probe expressions exist in Catalyst (the runtime-filter
    // rule injects them) but are not in the public registry — register them,
    // exactly as GraftExtensions does for this library's own expressions
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (e: Seq[Expression]) =>
        new BloomFilterAggregate(e(0), e(1), e(2)).toAggregateExpression())
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (e: Seq[Expression]) => BloomFilterMightContain(e(0), e(1)))

    // manifest over the purchase users (the "interesting keys" side)
    val purchasers = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"))
    purchasers.createOrReplaceTempView("bloom_purchasers")
    Tables.customer(spark, dir).createOrReplaceTempView("bloom_cust")
    // probe through the manifest as a SCALAR SUBQUERY — the form
    // might_contain requires (the bloom is a query-constant, shipped to
    // every task once, never a per-row column)
    val probed = spark.sql(
      """SELECT c_custkey, might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(user_id), CAST(1000 AS BIGINT),
        |                           CAST(8192 AS BIGINT)) FROM bloom_purchasers),
        |  xxhash64(c_custkey)) AS hit
        |FROM bloom_cust""".stripMargin)
    val truth = purchasers.distinct()
      .withColumnRenamed("user_id", "c_custkey")
      .withColumn("member", lit(true))
    val joined = probed.join(truth, Seq("c_custkey"), "left").cache()

    // contract 1: every true member must hit (no false negatives)
    assert(joined.filter(col("member") && !col("hit")).count() == 0,
      "bloom filter produced a false negative")
    // contract 2: non-members rarely hit (8192 bits / ~150 keys ⇒ FPR ≪ 5%)
    val nonMembers = joined.filter(col("member").isNull)
    val fpr = nonMembers.filter(col("hit")).count().toDouble /
      math.max(nonMembers.count(), 1L)
    assert(fpr < 0.05, s"false-positive rate $fpr exceeds bound")
    joined.unpersist()
  }
}
