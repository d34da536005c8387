package graft.expressions

import graft.operators.ByteLevel
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode_bytes(text string, merges array<struct<lhs:string,
  * rhs:string>>) -> array<string>` — the BYTE-LEVEL sibling of
  * [[BpeEncode]], the production GPT-2/Llama-class encoder shape:
  *
  *  - the document is pretokenized by [[ByteLevel.PreTokPattern]] and
  *    each pretoken re-expressed over the 256-symbol byte alphabet
  *    ([[ByteLevel.mapWord]] — one stand-in char per UTF-8 byte);
  *  - each pretoken then takes the standard lowest-surviving-rank BPE
  *    merge loop ([[BpeEncode.mergeAndEmit]], shared) under a
  *    [[graft.operators.Bpe.trainBytes]] merge table;
  *  - there is NO end-of-word marker (byte-level vocabularies carry
  *    the word boundary as the leading-space stand-in 'Ġ' instead)
  *    and NO unknown token — every initial symbol is one of the 256
  *    byte stand-ins, so any input in any script round-trips
  *    ([[ByteLevel.unmapWord]] of the concatenated output equals the
  *    input's bytes).
  *
  * Case is not normalized (byte-level tokenizers are case-preserving);
  * callers wanting folded text pass `lower(text)`. The merge-table
  * parse rides [[BpeEncode.ranksFor]]'s per-task model cache — the
  * same literal/broadcast delivery contract and null contract. */
case class BpeEncodeBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s.forall(_.dataType == StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_bytes requires (string, array<struct<string, string>>), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeEncodeBytes.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.BpeEncodeBytes.encode($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeBytes =
    copy(left = newLeft, right = newRight)
}

object BpeEncodeBytes {

  /** Shared by interpreted eval and generated code (hence public). */
  def encode(text: UTF8String, merges: ArrayData): ArrayData = {
    val ranks = BpeEncode.ranksFor(merges)
    val out = new java.util.ArrayList[UTF8String]()
    ByteLevel.preTokens(text.toString).foreach { mapped =>
      // initial symbols: one per stand-in char (every stand-in is a
      // single BMP char by construction — one UTF-8 byte each)
      val syms = new java.util.ArrayList[String](mapped.length)
      var i = 0
      while (i < mapped.length) {
        syms.add(String.valueOf(mapped.charAt(i)))
        i += 1
      }
      BpeEncode.mergeAndEmit(syms, ranks, out)
    }
    new GenericArrayData(out.toArray)
  }
}
