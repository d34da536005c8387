package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `wordpiece_encode(text string, vocab array<string>) -> array<string>`
  * — segment a document under a trained WordPiece vocabulary
  * ([[graft.operators.WordPiece.vocab]]), as a native expression fused
  * into the scan's WholeStageCodegen (the [[BpeEncode]] delivery
  * pattern: bounded model state as a plan literal or [[BroadcastRef]],
  * per-task parse identity-cached).
  *
  * Per word (single-space token contract, matching training's
  * [[graft.operators.Bpe.wordFreq]]): GREEDY LONGEST-MATCH-FIRST (the
  * BERT WordPiece algorithm) — at the word start, the longest prefix
  * present in the vocabulary as a PLAIN piece; at every later
  * position, the longest substring present as a `##`-continuation
  * piece; if any position matches nothing (or the word exceeds
  * [[WordPieceEncode.MaxWordChars]] code points), the ENTIRE word
  * becomes one `[UNK]` token — WordPiece's whole-word failure rule,
  * not a per-character fallback (contrast [[UnigramEncode]]'s
  * char-level unk costing). Matching is by code points (training's
  * `substr` semantics), so supplementary characters never split.
  *
  * Case is NOT normalized here: training lowercases, so callers pass
  * `lower(text)` — the expression encodes exactly the string given.
  *
  * Null contract: null if `text` or `vocab` is null (BinaryExpression
  * null-safe eval). A null element INSIDE the vocabulary is model
  * corruption and throws — caller bug, not data. */
case class WordPieceEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode requires (string, array<string>), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    WordPieceEncode.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.WordPieceEncode.encode($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordPieceEncode =
    copy(left = newLeft, right = newRight)
}

object WordPieceEncode {

  private val ContPrefix = "##"
  private val UnkToken = UTF8String.fromString("[UNK]")

  /** Words longer than this many code points are `[UNK]` without
    * matching (the BERT `max_input_chars_per_word` rule — a
    * pathological unbroken string would otherwise cost O(len²)
    * substring probes per word). */
  val MaxWordChars = 100

  /** Parsed model: the piece set plus the longest piece length in code
    * points (the match loop's upper bound). Cached per task by
    * reference identity + a count/first/last fingerprint — the
    * [[BpeEncode.ranksFor]] guard-rail rationale applies verbatim
    * (literal/broadcast delivery never reuses a buffer; a
    * join-produced vocab column stays correct but re-parses per
    * row). */
  private[expressions] final class Model(val ref: ArrayData, val n: Int,
      val first: UTF8String, val last: UTF8String,
      val pieces: java.util.HashSet[String], val maxLen: Int)
  @volatile private var cached: Model = null

  private def pieceOf(vocab: ArrayData, i: Int): UTF8String = {
    val p = vocab.getUTF8String(i)
    require(p != null, s"wordpiece_encode: vocab[$i] is null — corrupt model")
    p
  }

  private[expressions] def modelFor(vocab: ArrayData): Model = {
    val c = cached
    val n = vocab.numElements()
    if (c != null && (c.ref eq vocab) && c.n == n &&
        (n == 0 || (c.first.equals(pieceOf(vocab, 0)) &&
          c.last.equals(pieceOf(vocab, n - 1)))))
      return c
    val set = new java.util.HashSet[String](n * 2)
    var maxLen = 1
    var i = 0
    while (i < n) {
      val s = pieceOf(vocab, i).toString
      set.add(s)
      val body = if (s.startsWith(ContPrefix)) s.substring(ContPrefix.length) else s
      val cps = body.codePointCount(0, body.length)
      if (cps > maxLen) maxLen = cps
      i += 1
    }
    val m = new Model(vocab, n,
      if (n > 0) pieceOf(vocab, 0).clone() else null,
      if (n > 0) pieceOf(vocab, n - 1).clone() else null, set, maxLen)
    cached = m
    m
  }

  /** Shared by interpreted eval and generated code (hence public). */
  def encode(text: UTF8String, vocab: ArrayData): ArrayData = {
    val model = modelFor(vocab)
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) encodeWord(word, model, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String, model: Model,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // code-point boundaries: bounds(i) = char offset of code point i
    val nCps = word.codePointCount(0, word.length)
    if (nCps > MaxWordChars) { out.add(UnkToken); return }
    val bounds = new Array[Int](nCps + 1)
    var ci = 0
    var cp = 0
    while (cp < nCps) {
      bounds(cp) = ci
      ci += Character.charCount(word.codePointAt(ci))
      cp += 1
    }
    bounds(nCps) = word.length
    val toks = new java.util.ArrayList[UTF8String](4)
    var pos = 0
    while (pos < nCps) {
      var len = math.min(model.maxLen, nCps - pos)
      var matched = -1
      var key: String = null
      while (matched < 0 && len >= 1) {
        val cand = word.substring(bounds(pos), bounds(pos + len))
        val probe = if (pos == 0) cand else ContPrefix + cand
        if (model.pieces.contains(probe)) { matched = len; key = probe }
        else len -= 1
      }
      if (matched < 0) { out.add(UnkToken); return } // whole-word failure
      toks.add(UTF8String.fromString(key))
      pos += matched
    }
    var i = 0
    while (i < toks.size()) { out.add(toks.get(i)); i += 1 }
  }
}
