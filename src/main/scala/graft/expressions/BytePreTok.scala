package graft.expressions

import graft.operators.ByteLevel
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `byte_pretok(text string) -> array<string>` — byte-level
  * pretokenization ([[ByteLevel]]): split `text` with the shared
  * GPT-2-style regex, re-express each pretoken as its UTF-8 bytes
  * mapped to printable stand-in characters. The training front end of
  * the byte-level tokenizer — `explode(byte_pretok(text))` feeds the
  * one corpus-wide `(word, freq)` fold ([[graft.operators.Bpe.wordFreqBytes]])
  * — fused into the scan as one native codegen'd call per row. */
case class BytePreTok(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_pretok"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_pretok requires string, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    BytePreTok.pretok(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expressions.BytePreTok.pretok($t)")

  override protected def withNewChildInternal(newChild: Expression): BytePreTok =
    copy(child = newChild)
}

object BytePreTok {
  /** Shared by interpreted eval and generated code (hence public; named
    * apart from Expression.eval so Janino never resolves the call
    * against the case class's inherited overload). */
  def pretok(text: UTF8String): ArrayData =
    new GenericArrayData(
      ByteLevel.preTokens(text.toString).map(UTF8String.fromString).toArray[Any])
}
