package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hamming_dist(string, string) -> int` — positions at which two
  * equal-length strings differ, as a native codegen'd expression.
  *
  * Built for the SimHash near-dup verifier: signatures are short
  * fixed-width bit-strings ('0'/'1' × 16), and the verification step
  * compares millions of candidate pairs — a tight byte loop over the
  * two `UTF8String` buffers beats any composed-builtin spelling (which
  * would explode both strings to arrays and zip them).
  *
  * Null contract: null if either input is null (BinaryExpression
  * null-safe eval) or if the lengths differ — a ragged compare has no
  * Hamming distance. Byte-wise compare is exact for the bit-string
  * domain (ASCII); multi-byte codepoints would count per differing
  * byte, which is out of contract.
  */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  // null on ragged lengths even when both inputs are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_dist requires (string, string), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (x.numBytes() != y.numBytes()) return null
    val xb = x.getBytes
    val yb = y.getBytes
    var d = 0
    var i = 0
    while (i < xb.length) {
      if (xb(i) != yb(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numBytes() != $b.numBytes()) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $xb = $a.getBytes();
         |  byte[] $yb = $b.getBytes();
         |  int $d = 0;
         |  for (int $i = 0; $i < $xb.length; $i++) {
         |    if ($xb[$i] != $yb[$i]) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
