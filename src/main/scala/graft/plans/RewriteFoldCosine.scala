package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSim

/** Optimizer rule: recognize the documented higher-order-function cosine
  * formulation
  * {{{
  *   aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc,v) -> acc+v)
  *     / (sqrt(aggregate(a, 0D, ..x*x..)) * sqrt(aggregate(b, 0D, ..x*x..)))
  * }}}
  * and rewrite it to graft's fused codegen'd CosineSim. The fold runs
  * interpreted (higher-order functions have no codegen) at ~30x the
  * cost; the rewrite is exact — CosineSim accumulates in the same
  * element order with the same float→double widening, AND mirrors the
  * fold's null semantics (unequal lengths → null via zip_with padding;
  * any null element → null via sum poisoning — ADVICE r2), so plans
  * that ship the portable SQL formulation silently get the fast path
  * with identical results on every input.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`) and by GraftSession.
  */
object RewriteFoldCosine extends Rule[LogicalPlan] {

  /** aggregate(zip_with(a, b, (x,y) -> cast(x)*cast(y)), 0.0, +) → (a, b) */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(
                Cast(x: NamedLambdaVariable, DoubleType, _, _),
                Cast(y: NamedLambdaVariable, DoubleType, _, _), _), Seq(lx, ly), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
            LambdaFunction(fin: NamedLambdaVariable, _, _))
          if x.exprId == lx.exprId && y.exprId == ly.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  /** aggregate(a, 0.0, (acc,v) -> acc + cast(v)*cast(v)) → a  (self dot,
    * the shape `sqrt(aggregate(a, 0D, ...))` produces for norms). */
  private object SelfDotFold {
    def unapply(e: Expression): Option[Expression] = e match {
      case DotFold(a, b) if a.semanticEquals(b) => Some(a)
      case ArrayAggregate(a,
            Literal(0.0, DoubleType),
            LambdaFunction(Add(_: NamedLambdaVariable, Multiply(
              Cast(v1: NamedLambdaVariable, DoubleType, _, _),
              Cast(v2: NamedLambdaVariable, DoubleType, _, _), _), _), _, _),
            LambdaFunction(_: NamedLambdaVariable, _, _))
          if v1.exprId == v2.exprId =>
        Some(a)
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotFold(a, b),
            Multiply(Sqrt(SelfDotFold(a2)), Sqrt(SelfDotFold(b2)), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) &&
            isFloatArray(a) && isFloatArray(b) =>
        CosineSim(a, b)
    }
}
