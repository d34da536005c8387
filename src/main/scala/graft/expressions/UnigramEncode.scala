package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode(text string, pieces array<struct<piece:string,
  * w:double>>) -> array<string>` — segment a document under a trained
  * unigram-LM tokenizer model ([[graft.operators.Unigram.train]]), as a
  * native expression fused into the scan's WholeStageCodegen (the
  * [[BpeEncode]] delivery pattern: bounded model state as a plan
  * literal or [[BroadcastRef]], per-task parse identity-cached).
  *
  * Per word (single-space token contract, matching training's
  * [[graft.operators.Bpe.wordFreq]]): Viterbi — the segmentation
  * maximizing Σ w(piece) over the word's pieces, the unigram-LM MAP
  * decode (Kudo 2018). `w` is a log-probability, so the sum is the
  * segmentation's log-likelihood. A position no piece covers falls
  * back to its single character at [[UnigramEncode.UnkWeight]] (the
  * byte/char-fallback coverage rule: encoding never fails, unknown
  * chars cost enough that any real piece beats them).
  *
  * DETERMINISTIC TIE RULE (shared by interpreted eval, codegen, and
  * training's E-step, and replayed by the spec's exhaustive
  * enumerator): higher total weight, then FEWER pieces, then at each
  * choice point scanning from the word's END the LONGER last piece.
  * The rule is suffix-composable, so the left-to-right DP's local
  * (weight, -count, lastLen) argmax realizes the global order.
  *
  * No end-of-word marker: unlike BPE's `</w>` (where merges must not
  * cross words), unigram pieces are plain substrings — the word
  * boundary lives in the space split alone.
  *
  * Null contract: null if `text` or `pieces` is null; a null element
  * or null piece/weight INSIDE the model is corruption and throws. */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s(0).dataType == StringType && s(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"unigram_encode requires (string, array<struct<string, double>>), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    UnigramEncode.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.UnigramEncode.encode($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramEncode =
    copy(left = newLeft, right = newRight)
}

object UnigramEncode {

  /** Weight of an unknown single character — below any real
    * log-probability a trained model can hold (counts are bounded by
    * corpus size; ln(1/2⁶³) ≈ −43.7), so a known piece always beats
    * the unk fallback and two unks never beat one. */
  val UnkWeight: Double = -1e4

  /** Parsed model: piece → weight plus the max piece length (the DP's
    * inner-loop bound). Cached per task by reference identity + a
    * first/last fingerprint — the [[BpeEncode.ranksFor]] guard-rail
    * rationale applies verbatim (literal/broadcast delivery never
    * reuses a buffer; a join-produced model column stays correct but
    * re-parses per row). */
  private[expressions] final class Model(val ref: ArrayData, val n: Int,
      val firstPiece: UTF8String, val lastPiece: UTF8String,
      val weights: java.util.HashMap[String, java.lang.Double], val maxLen: Int)
  @volatile private var cached: Model = null

  private def pieceOf(pieces: ArrayData, i: Int): (UTF8String, Double) = {
    val row = pieces.getStruct(i, 2)
    require(row != null && !row.isNullAt(0) && !row.isNullAt(1),
      s"unigram_encode: pieces[$i] is null or has a null field — corrupt model")
    (row.getUTF8String(0), row.getDouble(1))
  }

  private[expressions] def modelFor(pieces: ArrayData): Model = {
    val c = cached
    val n = pieces.numElements()
    if (c != null && (c.ref eq pieces) && c.n == n &&
        (n == 0 || (c.firstPiece.equals(pieceOf(pieces, 0)._1) &&
          c.lastPiece.equals(pieceOf(pieces, n - 1)._1))))
      return c
    val m = new java.util.HashMap[String, java.lang.Double](n * 2)
    var maxLen = 1
    var i = 0
    while (i < n) {
      val (p, w) = pieceOf(pieces, i)
      val s = p.toString
      require(s.nonEmpty, s"unigram_encode: pieces[$i] is the empty string — corrupt model")
      // first occurrence wins (models are deduplicated at training time)
      m.putIfAbsent(s, java.lang.Double.valueOf(w))
      if (s.length > maxLen) maxLen = s.length
      i += 1
    }
    val model = new Model(pieces, n,
      if (n > 0) pieceOf(pieces, 0)._1.clone() else null,
      if (n > 0) pieceOf(pieces, n - 1)._1.clone() else null, m, maxLen)
    cached = model
    model
  }

  /** Shared by interpreted eval and generated code (hence public). */
  def encode(text: UTF8String, pieces: ArrayData): ArrayData = {
    val model = modelFor(pieces)
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        val segs = encodeWord(word, model.weights, model.maxLen)
        var i = 0
        while (i < segs.size()) { out.add(UTF8String.fromString(segs.get(i))); i += 1 }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Viterbi over one word under the documented tie rule — also the
    * E-step scorer of [[graft.operators.Unigram]] (training and
    * application MUST segment identically or EM counts drift from what
    * the deployed encoder produces). */
  def encodeWord(word: String, weights: java.util.HashMap[String, java.lang.Double],
                 maxLen: Int): java.util.ArrayList[String] = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val count = new Array[Int](n + 1)
    val back = new Array[Int](n + 1) // length of the piece ending at i
    var i = 1
    while (i <= n) {
      var bw = Double.NegativeInfinity
      var bc = Int.MaxValue
      var bl = 0
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        val ww = weights.get(word.substring(i - l, i))
        val pw = if (ww != null) ww.doubleValue()
                 else if (l == 1) UnkWeight else Double.NaN
        if (!pw.isNaN) {
          val cw = best(i - l) + pw
          val cc = count(i - l) + 1
          // higher weight, then fewer pieces, then the LONGER last piece
          if (cw > bw || (cw == bw && (cc < bc || (cc == bc && l > bl)))) {
            bw = cw; bc = cc; bl = l
          }
        }
        l += 1
      }
      best(i) = bw; count(i) = bc; back(i) = bl
      i += 1
    }
    val out = new java.util.ArrayList[String]()
    var p = n
    while (p > 0) { out.add(0, word.substring(p - back(p), p)); p -= back(p) }
    out
  }
}
