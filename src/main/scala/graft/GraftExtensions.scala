package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CdcSplit, DotProduct, InterleaveBits, SqDist, UniqueWordsRatio}

/** Session-extensions installer — the production path for shipping this
  * library's custom Catalyst pieces to every session on a cluster:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Currently injects the native function surface (`unique_words_ratio`).
  * Custom logical plans / optimizer rules / strategies would be injected
  * here too (`injectOptimizerRule` / `injectPlannerStrategy`) — the survey's
  * conclusion (SURVEY.md §4) is that this engine needs none for
  * correctness: every reference operator lowers to DataFrame algebra that
  * Catalyst already optimizes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("unique_words_ratio"),
      new ExpressionInfo(classOf[UniqueWordsRatio].getName, "unique_words_ratio"),
      (exprs: Seq[Expression]) => UniqueWordsRatio(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sq_dist"),
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (exprs: Seq[Expression]) => SqDist(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (exprs: Seq[Expression]) => InterleaveBits(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cdc_split"),
      new ExpressionInfo(classOf[CdcSplit].getName, "cdc_split"),
      (exprs: Seq[Expression]) => CdcSplit(exprs.head)))
    // rewrite composed plain-double aggregate(zip_with(..)) dot products to
    // the fused native expression — bit-exact, one codegen'd loop
    ext.injectOptimizerRule(_ => graft.plans.FuseDotProduct)
  }
}
