package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing an exact distinct count of longs — the
  * reference's set-union pane accumulator (`CountUniqueUsers` /
  * `UnionUniqueUsers`, ActivePostStatistician.java:224-271; SURVEY.md §2.8
  * "one optional `Aggregator` for set-union").
  *
  * This is the typed-UDAF extension tier: a mergeable accumulator with
  * map-side partial aggregation (reduce) and shuffle-side union (merge) —
  * exactly the two-phase shape of the reference's
  * `AggregateFunction`/`ProcessWindowFunction` pairs. The built-in
  * `count_distinct` (expand + hash agg) or `approx_count_distinct` (HLL)
  * remain the defaults; this class exists for semantics that built-ins
  * cannot express (exact set-valued state with custom merge logic) and is
  * oracle-verified through `w5_distinct_agg`.
  */
object DistinctCountAgg extends Aggregator[Long, Set[Long], Long] {
  override def zero: Set[Long] = Set.empty
  override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
  override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 union b2
  override def finish(r: Set[Long]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
