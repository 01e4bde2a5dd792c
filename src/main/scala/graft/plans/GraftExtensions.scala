package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the HOF dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and replace it with the codegen'd DotProductExpr — the engine's
  * realization of the reference's planned partial-evaluation pass
  * (SURVEY.md §4.2c): users write declarative HOFs, the optimizer swaps in
  * the tight loop. Semantics-preserving incl. nulls: null arrays, null
  * elements, and zip_with's unequal-length padding all yield null in both
  * forms.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable,
          y: NamedLambdaVariable, _), Seq(px: NamedLambdaVariable,
          py: NamedLambdaVariable), _) =>
        (x.exprId == px.exprId && y.exprId == py.exprId) ||
          (x.exprId == py.exprId && y.exprId == px.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(a: NamedLambdaVariable,
          v: NamedLambdaVariable, _), Seq(pa: NamedLambdaVariable,
          pv: NamedLambdaVariable), _) =>
        (a.exprId == pa.exprId && v.exprId == pv.exprId) ||
          (a.exprId == pv.exprId && v.exprId == pa.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable,
          Seq(p: NamedLambdaVariable), _) => v.exprId == p.exprId
      case _ => false
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** (x - y) * (x - y) over the two zip_with variables — both factors must
    * be the SAME subtraction of the two distinct lambda params. (y-x)² is
    * accepted too: negation is exact in IEEE-754, so the square is
    * bit-identical. */
  private object SqDiffLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(
          Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
          Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
          Seq(px: NamedLambdaVariable, py: NamedLambdaVariable), _) =>
        x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
          x1.exprId != y1.exprId &&
          Set(x1.exprId, y1.exprId) == Set(px.exprId, py.exprId)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, MulLambda()),
          Literal(zero, DoubleType), AddLambda(), IdentityFinish())
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) =>
        DotProductExpr(a, b)
      case ArrayAggregate(ZipWith(a, b, SqDiffLambda()),
          Literal(zero, DoubleType), AddLambda(), IdentityFinish())
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) =>
        SqDistExpr(a, b)
    }
}

/** SparkSessionExtensions entry point — usable via
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`. GraftSession installs it on
  * every engine session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => DotProductRewrite)
}
