package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Mergeable Misra-Gries heavy-hitters sketch over a token stream — the
  * third mergeable-summary primitive in this repo's typed-UDAF tier
  * (exact set union: [[DistinctCountAgg]]; rank sketch: the GK quantiles
  * behind t9). Same two-phase shape as the reference's
  * `AggregateFunction`/`ProcessWindowFunction` pairs (word count at
  * wc.rs:34-41 is the reference's own heavy-token pipeline, SURVEY.md §2.4
  * W10): `reduce` is the classic streaming update (count if tracked,
  * insert if room, otherwise decrement every counter), `merge` is the
  * Agarwal-et-al mergeable-summaries rule (sum counters, subtract the
  * (k+1)-th largest, drop non-positives), preserving the additive error
  * bound across arbitrary partitionings.
  *
  * Guarantee used by `t17_heavy_hitters`: every token with true frequency
  * strictly greater than N/(k+1) survives in the final candidate map, no
  * matter how the input was partitioned — the sketch may over-admit but
  * never misses, so an exact, candidate-pruned second pass recovers the
  * precise heavy-hitter set. Pinned by the `MisraGriesSpec` property test
  * over random skewed streams and random partitionings.
  *
  * 100 TB story: state is a bounded k-entry map regardless of vocabulary
  * size (billions of distinct tokens at corpus scale); partials combine
  * map-side, and only O(k · partitions) counters ever cross the wire —
  * versus a full token-keyed shuffle of the whole vocabulary for the
  * naive exact groupBy.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 1, "Misra-Gries capacity must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    m.get(tok) match {
      case Some(c)            => m.updated(tok, c + 1L)
      case None if m.size < k => m.updated(tok, 1L)
      // full and unseen: decrement all counters, evict those reaching zero
      case None => m.collect { case (w, c) if c > 1L => w -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L)))
      .toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from every counter: the
      // mergeable-summaries reduction that keeps total error additive
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  /** Candidate tokens, sorted for deterministic downstream plans. */
  override def finish(m: Map[String, Long]): Array[String] =
    m.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}
