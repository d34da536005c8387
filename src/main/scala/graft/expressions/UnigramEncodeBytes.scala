package graft.expressions

import graft.operators.ByteLevel
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode_bytes(text string, pieces array<struct<piece:string,
  * w:double>>) -> array<string>` — the BYTE-LEVEL sibling of
  * [[UnigramEncode]], completing the tokenizer matrix
  * {BPE, unigram} × {word-level, byte-level} (SentencePiece's
  * production default IS unigram with byte fallback):
  *
  *  - the document is pretokenized by [[ByteLevel.PreTokPattern]] and
  *    each pretoken re-expressed over the 256-symbol byte alphabet
  *    ([[ByteLevel.mapWord]]);
  *  - each mapped pretoken is Viterbi-segmented under the piece
  *    weights ([[UnigramEncode.encodeWord]], shared — training and
  *    application must segment identically);
  *  - an uncovered position falls back to its single BYTE stand-in at
  *    [[UnigramEncode.UnkWeight]] — so every input in every script
  *    segments, and the concatenated output round-trips to the
  *    original bytes ([[ByteLevel.unmapWord]]).
  *
  * Case is not normalized (byte-level is case-preserving); callers
  * wanting folded text pass `lower(text)`. The model parse rides
  * [[UnigramEncode.modelFor]]'s per-task cache — same
  * literal/broadcast delivery and null contracts. */
case class UnigramEncodeBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode_bytes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s(0).dataType == StringType && s(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"unigram_encode_bytes requires (string, array<struct<string, double>>), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    UnigramEncodeBytes.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.UnigramEncodeBytes.encode($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramEncodeBytes =
    copy(left = newLeft, right = newRight)
}

object UnigramEncodeBytes {
  /** Shared by interpreted eval and generated code (hence public). */
  def encode(text: UTF8String, pieces: ArrayData): ArrayData = {
    val model = UnigramEncode.modelFor(pieces)
    val out = new java.util.ArrayList[UTF8String]()
    ByteLevel.preTokens(text.toString).foreach { mapped =>
      val segs = UnigramEncode.encodeWord(mapped, model.weights, model.maxLen)
      var i = 0
      while (i < segs.size()) { out.add(UTF8String.fromString(segs.get(i))); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}
