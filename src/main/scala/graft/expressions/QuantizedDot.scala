package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `quantized_dot(array<bigint>, array<bigint>) -> bigint` — the exact
  * integer dot product at the heart of the similarity operators, as a
  * native codegen'd Catalyst expression.
  *
  * The built-in spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)`
  * is semantically identical but materializes the zipped intermediate
  * array and evaluates two lambda closures per element inside
  * higher-order-function machinery. This expression compiles to a tight
  * primitive loop over the two `ArrayData` buffers — no allocation, no
  * closure dispatch — which is the difference that matters when scoring
  * 10⁹ vector pairs. Preference order per the engine's design rules:
  * compose built-ins < native Expression (this) < UDF (never).
  *
  * Null contract matches the built-in spelling exactly: null if either
  * ARRAY is null (BinaryExpression's null-safe eval), null if any
  * ELEMENT is null (`x*y` is null → the fold is null), and null on a
  * LENGTH mismatch — `zip_with` pads the shorter array with nulls, so
  * the built-in fold is null on ragged inputs, and so is this.
  *
  * Overflow contract: `ansi = false` (the registered `quantized_dot`
  * function) wraps like Java arithmetic / LEGACY mode; `ansi = true`
  * (used by the optimizer rewrite of ANSI-mode `aggregate(zip_with)`
  * spellings) mirrors the built-in's ZIP-THEN-FOLD order exactly:
  * every product inside the common prefix is evaluated with
  * `multiplyExact` (throwing on overflow even when a null element or
  * ragged length will null the final fold), while `addExact` runs only
  * until the first null reaches the accumulator — after that the fold
  * is null-propagating and add overflow can no longer throw. The one
  * divergence is the error type (plain `ArithmeticException` vs
  * Spark's error class).
  */
case class QuantizedDot(left: Expression, right: Expression, ansi: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  // BinaryExpression would infer nullability from the inputs — but this
  // expression introduces null on null ELEMENTS even when both arrays
  // are non-nullable, so it must declare itself nullable outright.
  override def nullable: Boolean = true

  // ExpectsInputTypes is unusable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); check the input types directly.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (ansi) {
      val n = math.min(x.numElements(), y.numElements())
      val ragged = x.numElements() != y.numElements()
      var acc = 0L
      var nullSeen = false
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) nullSeen = true
        else {
          val p = Math.multiplyExact(x.getLong(i), y.getLong(i))
          if (!nullSeen) acc = Math.addExact(acc, p)
        }
        i += 1
      }
      if (nullSeen || ragged) null else acc
    } else {
      // wrap mode: null outcomes short-circuit (wrapping arithmetic has
      // no observable effects to preserve)
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val nullSeen = ctx.freshName("nullSeen")
      if (ansi)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |boolean $nullSeen = $a.numElements() != $b.numElements();
           |boolean ${nullSeen}Elem = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${nullSeen}Elem = true;
           |  } else {
           |    long $p = java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i));
           |    if (!${nullSeen}Elem) {
           |      $acc = java.lang.Math.addExact($acc, $p);
           |    }
           |  }
           |}
           |${ev.isNull} = $nullSeen || ${nullSeen}Elem;
           |${ev.value} = $acc;
         """.stripMargin
      else
        s"""
           |int $n = $a.numElements();
           |long $acc = 0L;
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |}
           |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${ev.isNull} = true;
           |  } else {
           |    $acc += $a.getLong($i) * $b.getLong($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
