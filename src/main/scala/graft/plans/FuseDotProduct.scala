package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the composed plain-double dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, x) -> acc + x)
  *
  * over two float arrays into the native fused [[DotProduct]] expression
  * (`dot_f32`) — same ascending-index accumulation order, so the rewrite is
  * bit-exact, but one codegen'd loop over the raw buffers instead of an
  * intermediate 64-element array plus per-element higher-order-function
  * dispatch.
  *
  * This is the pattern a USER of the library writes naturally (the
  * higher-order-function spelling is the idiomatic DataFrame form); with
  * `spark.sql.extensions=graft.GraftExtensions` installed they get the
  * native loop without knowing `dot_f32` exists. The match is deliberately
  * exact — any deviation (decimal casts, different fold shape, non-float
  * arrays) leaves the expression untouched, so the exact-decimal oracle
  * path is never rewritten.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x (a lambda element of double type) or double(x) — the two spellings
    * of "this lambda variable as a double". */
  private def asVar(e: Expression): Option[ExprId] = e match {
    case v: NamedLambdaVariable => Some(v.exprId)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v.exprId)
    case _ => None
  }

  private def rewrite(e: Expression): Expression = e match {
    case agg @ ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0d, DoubleType),
        LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(res: NamedLambdaVariable), _))
      if isFloatArray(a) && isFloatArray(b) &&
         // merge lambda is exactly acc + element (either order)
         Set(asVar(add.left), asVar(add.right)) == Set(Some(acc.exprId), Some(el.exprId)) &&
         // zip lambda multiplies exactly the two element vars
         Set(asVar(mul.left), asVar(mul.right)) == Set(Some(x.exprId), Some(y.exprId)) &&
         // finish lambda is the identity
         asVar(fin).contains(res.exprId) =>
      DotProduct(a, b)
    case other => other.mapChildren(rewrite)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => rewrite(e) }
}
