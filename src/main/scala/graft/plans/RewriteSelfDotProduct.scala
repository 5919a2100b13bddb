package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the idiomatic-but-interpreted higher-order
  * self-dot-product
  *
  *   aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the whole-stage-codegen `VecDot(a, a)` (the squared-norm form
  * users write for normalization). Array higher-order functions are
  * CodegenFallback — interpreted, ~10x slower on hot paths — so a user
  * writing the natural HOF form silently loses codegen; this rule
  * gives it back.
  *
  * The rewrite only fires when it is PROVABLY semantics-preserving:
  *  - both `zip_with` inputs are the same expression (semanticEquals),
  *    so the arrays have equal length by construction and `zip_with`'s
  *    null padding for the longer side cannot occur (VecDot truncates
  *    to the shorter prefix — different semantics in general);
  *  - the array's elements are non-nullable (`containsNull = false`):
  *    on a null element the HOF fold propagates NULL through
  *    `acc + v`, while VecDot skips it;
  *  - the array's element type is float or double — the only types
  *    VecDot reads (`ArrayData.getFloat/getDouble`). An int/long array
  *    reaches this shape via `CAST(x AS DOUBLE) * CAST(y AS DOUBLE)`,
  *    and rewriting it would make VecDot reinterpret int-backed storage
  *    as doubles (checkInputDataTypes is not re-run post-optimizer).
  * Anything it cannot prove, it leaves alone — an optimizer rule that
  * widens semantics is a correctness bug, not an optimization.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`).
  */
object RewriteSelfDotProduct extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case Cast(child, DoubleType, _, _) => child
    case other => other
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** Non-null float/double elements — the exact domain VecDot supports. */
  private def elementsNonNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(mult, Seq(x, y), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(a1, a2, _), Seq(acc, v), _),
            LambdaFunction(finishBody, Seq(fv), _))
          if l.semanticEquals(r) && elementsNonNull(l) &&
            // merge is exactly acc + v
            isVar(a1, acc) && isVar(a2, v) &&
            // finish is the identity lambda
            isVar(finishBody, fv) &&
            // the zip function is x * y (modulo widening casts)
            (mult match {
              case Multiply(mx, my, _) =>
                isVar(stripDoubleCast(mx), x) && isVar(stripDoubleCast(my), y)
              case _ => false
            }) =>
        VecDot(l, r)
    }
}
