package graft.rules

import graft.expressions.QuantizedDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the composable dot-product spelling
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`
  *
  * into the native codegen'd [[QuantizedDot]] when both arrays are
  * `array<bigint>`. Users (and generated SQL) can keep writing the
  * built-in spelling and still get the tight primitive loop — no
  * zipped intermediate array, no per-element lambda dispatch.
  *
  * Semantics-preserving by construction: QuantizedDot's null contract
  * was aligned exactly with the built-in fold (null array / null
  * element / ragged lengths → null), and the eval mode carries over —
  * LEGACY `+`/`*` (wrap on overflow) map to the wrapping variant, ANSI
  * (throw on overflow) to the `Math.*Exact` variant. Both lambdas must
  * agree on the mode.
  *
  * Lambda matching is by `exprId`, accepting either operand order of
  * the commutative `*` and `+`, and requires the aggregate's finish
  * lambda to be the identity (the 3-argument `aggregate` form).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** `op` combines exactly the two lambda variables, in either order. */
  private def combinesVars(l: Expression, r: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean = (l, r) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
        (a.exprId == v2.exprId && b.exprId == v1.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // NOTE: the mode is read via the `.evalMode` ACCESSOR, not the third
    // constructor field — Spark 4 wraps it in a NumericEvalContext, and
    // comparing that context against an EvalMode value is always-false
    // (which would silently map ANSI spellings to wrap semantics).
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply,
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), false)),
          Literal(0L, LongType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), false),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), false))
        if isLongArray(a) && isLongArray(b) &&
          mul.evalMode == add.evalMode && mul.evalMode != EvalMode.TRY &&
          combinesVars(mul.left, mul.right, x, y) &&
          combinesVars(add.left, add.right, acc, v) &&
          fin.exprId == fv.exprId =>
      QuantizedDot(a, b, ansi = mul.evalMode == EvalMode.ANSI)
  }
}
