package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** User-facing registration of Spark's own runtime-filter bloom machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * Catalyst's `InjectRuntimeFilter` rule composes internally but does not
  * expose as SQL functions):
  *
  *   bloom_filter_agg(xxhash64(key), estimatedNumItems, numBits) -> binary sketch
  *   might_contain(sketch, xxhash64(key))           -> boolean
  *
  * The pattern this enables is the classic semi-join pruning sketch: at
  * 100 TB the exact key set of a bounded-but-large build side (an eval
  * suite's n-grams, a blocklist) cannot be broadcast, but its fixed-size
  * bloom (a few MB regardless of cardinality, sized by the two knobs) can
  * — probe rows that cannot possibly match are dropped BEFORE the shuffle
  * join, and the exact join over survivors keeps the result identical
  * (blooms have no false negatives; false positives only cost wasted
  * shuffle rows, bounded by the sizing). Used by `c9_bloom_decontam`.
  *
  * `might_contain` requires its sketch operand to be a constant
  * or a SCALAR SUBQUERY (it plans the build once and inlines the sketch
  * as a literal into the codegen'd probe filter, deserializing once per
  * task) — so consumers express the probe via `spark.sql` with
  * `(SELECT bloom_filter_agg(...) FROM build_side)` rather than a joined column.
  */
object BloomBridge {
  /** Register both functions in a session's registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)).toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1)))
  }
}
