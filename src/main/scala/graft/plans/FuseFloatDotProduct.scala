package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule fusing the declarative dot-product fold
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0d,
  * (acc, v) -> acc + v)` over float arrays into the codegen'd
  * [[graft.functions.FloatDotProduct]].
  *
  * Why a Rule (the brief's extension point (c), used where it genuinely
  * pays): higher-order functions are CodegenFallback in Spark 4, so the
  * portable fold pays interpreted lambda dispatch and an intermediate
  * product array per row. Users who write the declarative form — or
  * arrive via SQL text — get the fused loop automatically; the rewrite is
  * semantics-preserving bit-for-bit (same left-to-right double
  * accumulation, proven by the existing fold-vs-native equality tests).
  *
  * Registered by GraftExtensions (spark.sql.extensions) or ad hoc via
  * `spark.experimental.extraOptimizations`. Non-matching aggregates pass
  * through untouched.
  */
object FuseFloatDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def castToDouble(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType => Some(c.child)
    case _ => None
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isPlainSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
                        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && r.exprId == v.exprId
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(r: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      r.exprId == arg.exprId
    case _ => false
  }

  private def isElementProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(cl, cr, _),
                        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (castToDouble(cl), castToDouble(cr)) match {
        case (Some(xl: NamedLambdaVariable), Some(yr: NamedLambdaVariable)) =>
          xl.exprId == x.exprId && yr.exprId == y.exprId
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg: ArrayAggregate =>
      agg.argument match {
        case zw: ZipWith
            if isFloatArray(zw.left) && isFloatArray(zw.right) &&
               isZeroDouble(agg.zero) && isPlainSum(agg.merge) &&
               isIdentity(agg.finish) && isElementProduct(zw.function) =>
          graft.functions.FloatDotProduct(zw.left, zw.right)
        case _ => agg
      }
  }
}
