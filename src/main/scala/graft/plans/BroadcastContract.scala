package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The 100 TB broadcast contract, enforced structurally.
  *
  * Disease class (fixed in d3/d4/t4 round 2, s2/d5 round 3, x5 round 5): an
  * explicit `broadcast()` hint whose input grows with the corpus OOMs a
  * 100 TB run. Every hint subtree must be bounded BY CONSTRUCTION: an
  * aggregation (bucket-prefix / centroid / one-row totals), a distinct, a
  * limit, a local relation (params), a declared modulo-contract filter
  * (query-side `vec_id % 100`, eigen `user_id % 50`), or a
  * fixed-cardinality dimension (region: 5 rows, nation: 25 — constant in
  * TPC-H at every SF).
  *
  * Used two ways: `QueriesSmokeSpec` walks every batch query's analyzed
  * plan, and `Streams.runToMemory` asserts it on every streaming query at
  * start time — so the contract covers streaming plans at RUNTIME, not just
  * in a spec that could skip them.
  */
object BroadcastContract {

  private val boundedRdds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** `localCheckpoint` a relation that is bounded BY CONSTRUCTION at its
    * call site (e.g. trained k-means centroids: k ≤ 10 by seeding) and
    * register the cut lineage as bounded — a checkpoint's `LogicalRDD`
    * otherwise erases the Aggregate/Limit evidence the hint walk needs,
    * so a later `broadcast()` of the checkpointed relation would be
    * indistinguishable from the unbounded disease class. The registry is
    * keyed by the checkpointed RDD id, which survives the analyzer's
    * `newInstance` dedup on self-joins. */
  def boundedCheckpoint(df: DataFrame, reason: String): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => boundedRdds.add(lr.rdd.id)
      case other => throw new IllegalStateException(
        s"boundedCheckpoint($reason): expected LogicalRDD, got ${other.nodeName}")
    }
    cp
  }

  private def bounded(p: LogicalPlan): Boolean = {
    val bounding = p.collect {
      case _: Aggregate => true
      case _: Deduplicate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true
      // spark.range(n): cardinality is a plan-time literal (t29's canonical
      // 256-bucket space) — constant at every SF by construction, but only
      // bounding when the literal itself is small (an unguarded Range would
      // let spark.range(10^12) under a hint pass the 100 TB contract)
      case r: Range if r.numElements <= BigInt(10000) => true
      case lr: org.apache.spark.sql.execution.LogicalRDD
        if boundedRdds.contains(lr.rdd.id) => true
      case f: Filter if "% (cast\\()?(50|100)".r
        .findFirstIn(f.condition.toString).isDefined => true
    }
    lazy val dimsOnly = {
      val leaves = p.collectLeaves()
      leaves.nonEmpty && leaves.forall {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.forall { rp =>
            val s = rp.toString; s.contains("region") || s.contains("nation")
          }
          case _ => false
        }
        case _ => false
      }
    }
    bounding.nonEmpty || dimsOnly
  }

  /** Hint subtrees in `plan` that carry a broadcast-class strategy hint but
    * have no bounding construction — each a would-be OOM at 100 TB. */
  def unboundedHints(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined && !bounded(h.child) =>
        h.child.nodeName
    }

  /** Joins with NO equi-key (cross or pure-theta conditions) where neither
    * side is bounded by construction — the other 100 TB disease class: a
    * non-equi join of two corpus-sized relations is a quadratic
    * nested-loop however it's physically planned. Every legitimate
    * cross/theta join in the repo pairs the corpus with a bounded side
    * (broadcast scalar totals, the modulo-contract query set, k
    * centroids); this walk proves that stays true. */
  def unboundedNonEquiJoins(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case j: Join if !hasEquiKey(j) && !bounded(j.left) && !bounded(j.right) =>
        s"${j.joinType} join(${j.left.nodeName}, ${j.right.nodeName})"
    }

  private def hasEquiKey(j: Join): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, EqualNullSafe}
    j.condition.exists(_.exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _ => false
    })
  }

  /** The ONLY sanctioned driver-side materialization of a computed
    * relation: collect rows of a relation that is bounded BY CONSTRUCTION
    * (asserted with the same structural walk the broadcast contract
    * uses). Exists for streaming ROUTING TABLES — a streaming projection
    * cannot reference a computed relation without a join, and the join
    * form of (say) nearest-centroid routing would fan every arriving row
    * out ×k and need a per-row argmin aggregation, where the collected
    * k-row table folds into a pure per-row expression. The reference does
    * the same thing when it broadcast-replicates bounded state to every
    * instance (SURVEY §2.2 P7). */
  def boundedCollect(df: DataFrame, reason: String): Array[org.apache.spark.sql.Row] = {
    require(bounded(df.queryExecution.analyzed),
      s"boundedCollect($reason): relation has no bounding construction (100 TB contract)")
    df.collect()
  }

  /** Assert the contract on a (batch or streaming) DataFrame's analyzed
    * plan. Called by `Streams.runToMemory` before every stream start. */
  def assertBounded(df: DataFrame, context: String): Unit = {
    val bad = unboundedHints(df.queryExecution.analyzed)
    require(bad.isEmpty,
      s"[$context] broadcast hint on an unbounded relation (100 TB contract): " +
        bad.mkString(", "))
  }
}
