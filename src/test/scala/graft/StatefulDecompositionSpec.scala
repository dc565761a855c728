package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, UnaryNode, Window => LWindow}

/** The global sequential folds (st3/st5/st6) EXECUTE as their
  * identical-result bucket decompositions; the naive single-partition
  * forms survive only here, as the oracle each decomposition is proven
  * against. Plus the structural contract that made the switch worth it:
  * no batch query may plan an unpartitioned window except the documented
  * bounded bucket-prefix relations (thousands of rows at any scale) — so
  * a bench run is warning-quiet and any NEW accidental global window
  * fails this suite instead of hiding in the noise floor. */
class StatefulDecompositionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("st3: naive sequential fold == bucket decomposition (bit-identical)") {
    assert(rows(queries.Stateful.st3_anomaly_naive(spark, dir)) ==
           rows(queries.Stateful.st3_anomaly_exact(spark, dir)))
  }

  test("st5: naive sequential fold == bucket decomposition (bit-identical)") {
    assert(rows(queries.Stateful.st5_running_avg_naive(spark, dir)) ==
           rows(queries.Stateful.st5_running_avg(spark, dir)))
  }

  test("st6: naive sequential fold == bucket decomposition (bit-identical)") {
    assert(rows(queries.Stateful.st6_naive(spark, dir)) ==
           rows(queries.Stateful.st6_conditional_signature(spark, dir)))
  }

  test("unpartitioned windows appear only over bounded bucket-prefix relations") {
    // the allowlist: prefix windows over per-bucket totals — relations whose
    // cardinality is time-range/dictionary-bucket bound, not corpus bound
    val allowed = Set("bucket", "_bkt", "bkt")
    // orderless global windows (a constant-folded partitionBy(lit(1)):
    // "attach the grand total") are fine when they sit directly above an
    // Aggregate — a grouped, dimension-bounded relation (t15's language
    // inventory), never the raw corpus
    @annotation.tailrec
    def overAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case u: UnaryNode => overAggregate(u.child)
      case _            => false
    }
    val streaming = SparkEntry.queries.keySet.filter(_.startsWith("x"))
    val bad = SparkEntry.queries.toSeq.collect {
      case (name, fn) if !streaming(name) =>
        fn(spark, dir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty =>
            val cols = w.orderSpec.flatMap(_.references.toSeq).map(_.name).toSet
            if ((cols.nonEmpty && cols.forall(c => allowed.exists(c.startsWith))) ||
                (cols.isEmpty && overAggregate(w.child)))
              None
            else Some(s"$name: global window ordered by [${cols.mkString(",")}]")
        }.flatten
    }.flatten
    assert(bad.isEmpty,
      s"unpartitioned window outside the bucket-prefix allowlist:\n${bad.mkString("\n")}")
  }
}
