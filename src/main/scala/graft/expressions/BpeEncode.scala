package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(text string, merges array<struct<lhs:string, rhs:string>>)
  * -> array<string>` — apply a trained BPE merge table
  * ([[graft.operators.Bpe.train]]) to a document, as a native
  * expression fused into the scan's WholeStageCodegen.
  *
  * Per word (single-space token contract, matching training's
  * [[graft.operators.Bpe.wordFreq]]): start from per-character symbols
  * plus the `</w>` marker, then repeatedly fuse the adjacent pair with
  * the LOWEST merge rank (rank = position in `merges`), greedily left
  * to right within a round — the standard BPE application order, which
  * reproduces training's segmentation on the training corpus. Case is
  * NOT normalized here: training lowercases, so callers pass
  * `lower(text)` (the expression encodes exactly the string it is
  * given).
  *
  * Why an expression and not N chained [[graft.operators.Bpe.mergeOnce]]
  * columns: application order is per-word data-dependent (lowest
  * SURVIVING rank next, not rank order globally), and a real merge
  * table is thousands of rules — thousands of chained higher-order
  * folds would blow the plan/codegen, where this is one tight loop
  * against a hash map. The merge table is bounded model state
  * (`nMerges` rows): a plan literal while small, a [[BroadcastRef]]
  * when shipped corpus-wide — the engine's standard model-delivery
  * split. The per-task parse of the table into a rank map is cached by
  * reference identity ([[BpeEncode.ranksFor]]), so per-row work never
  * re-reads the model.
  *
  * Null contract: null if `text` or `merges` is null (BinaryExpression
  * null-safe eval). A null element INSIDE `merges` (or a null
  * lhs/rhs) is model corruption and throws — caller bug, not data.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s.forall(_.dataType == StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, array<struct<string, string>>), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, m: Any): Any =
    BpeEncode.encode(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = graft.expressions.BpeEncode.encode($t, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  private val EndOfWord = "</w>"

  /** Single-slot model cache keyed by reference identity PLUS a content
    * fingerprint (element count + first/last rule): the merges child is
    * a literal or broadcast value, so every row of a task sees the SAME
    * ArrayData instance and the parse happens once per task (per model
    * swap, if a plan ever interleaves two models). The fingerprint is a
    * GUARD-RAIL, not a full-content check: it detects the common
    * mutation shapes — a swapped model under a reused reference almost
    * always differs in length or an end rule (models differ in size, or
    * were trained on different data) — and triggers a re-parse then; a
    * hypothetical accessor reusing one buffer for two same-length
    * models that differ only in MIDDLE rules would still be served
    * stale ranks. Nothing in the supported literal/broadcast delivery
    * paths reuses a buffer at all (each literal/broadcast value is its
    * own immutable ArrayData), so the residual case is unreachable on
    * the engine's query surface; a full-content hash would put O(rules)
    * work on the per-row hit path, which is exactly what the cache
    * exists to avoid. A per-row or join-produced merges column stays
    * CORRECT but misses the cache on every row and re-parses the
    * table — O(rules) per row; so does alternating two models' literals
    * row-by-row in one task. */
  private final class Model(val ref: ArrayData, val n: Int,
      val firstLhs: UTF8String, val firstRhs: UTF8String,
      val lastLhs: UTF8String, val lastRhs: UTF8String,
      val ranks: java.util.HashMap[String, Integer])
  @volatile private var cached: Model = null

  /** lhs/rhs of rule i, unmaterialized — also the corrupt-model null
    * check. `ord` is 0 (lhs) or 1 (rhs). */
  private def sideOf(merges: ArrayData, i: Int, ord: Int): UTF8String = {
    val row = merges.getStruct(i, 2)
    require(row != null && !row.isNullAt(0) && !row.isNullAt(1),
      s"bpe_encode: merges[$i] is null or has a null side — corrupt model")
    row.getUTF8String(ord)
  }

  private[expressions] def ranksFor(merges: ArrayData): java.util.HashMap[String, Integer] = {
    val c = cached
    val n = merges.numElements()
    // hit path runs PER ROW of a corpus-wide encode: byte-compare the
    // stored defensive UTF8String copies against the live accessors —
    // no Java String materialization on a hit
    if (c != null && (c.ref eq merges) && c.n == n &&
        (n == 0 || (c.firstLhs.equals(sideOf(merges, 0, 0)) &&
          c.firstRhs.equals(sideOf(merges, 0, 1)) &&
          c.lastLhs.equals(sideOf(merges, n - 1, 0)) &&
          c.lastRhs.equals(sideOf(merges, n - 1, 1)))))
      return c.ranks
    val m = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) {
      // first occurrence wins: rank IS the position, lowest is strongest
      m.putIfAbsent(sideOf(merges, i, 0).toString + " " + sideOf(merges, i, 1).toString,
        Integer.valueOf(i))
      i += 1
    }
    // clone() the fingerprint sides: the accessors may view a shared
    // buffer, and a stored view would defeat the staleness check
    cached = new Model(merges, n,
      if (n > 0) sideOf(merges, 0, 0).clone() else null,
      if (n > 0) sideOf(merges, 0, 1).clone() else null,
      if (n > 0) sideOf(merges, n - 1, 0).clone() else null,
      if (n > 0) sideOf(merges, n - 1, 1).clone() else null, m)
    m
  }

  /** Shared by interpreted eval and generated code (hence public). */
  def encode(text: UTF8String, merges: ArrayData): ArrayData = {
    val ranks = ranksFor(merges)
    val out = new java.util.ArrayList[UTF8String]()
    // Java Pattern split, limit -1: the exact machinery of Spark's
    // split(text, " ") in training — empty words carry no symbols
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) encodeWord(word, ranks, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String, ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // initial symbols: one per CODEPOINT (the character semantics of
    // training's per-position substr) + the end-of-word marker
    val syms = new java.util.ArrayList[String](word.length + 1)
    var cp = 0
    while (cp < word.length) {
      val n = Character.charCount(word.codePointAt(cp))
      syms.add(word.substring(cp, cp + n))
      cp += n
    }
    syms.add(EndOfWord)
    mergeAndEmit(syms, ranks, out)
  }

  /** The BPE application loop shared with [[BpeEncodeBytes]]:
    * repeatedly fuse the lowest-ranked surviving adjacent pair of
    * `syms` (all non-overlapping occurrences, left to right), then
    * emit the survivors. */
  private[expressions] def mergeAndEmit(syms: java.util.ArrayList[String],
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    var i = 0
    // repeatedly fuse the lowest-ranked surviving pair
    var done = syms.size() < 2
    while (!done) {
      var best = -1
      var bestRank = Integer.MAX_VALUE
      i = 0
      while (i < syms.size() - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        val (a, b) = (syms.get(best), syms.get(best + 1))
        // merge ALL non-overlapping (a, b) adjacencies left to right
        i = 0
        while (i < syms.size() - 1) {
          if (syms.get(i) == a && syms.get(i + 1) == b) {
            syms.set(i, a + b); syms.remove(i + 1)
          }
          i += 1
        }
        done = syms.size() < 2
      }
    }
    i = 0
    while (i < syms.size()) { out.add(UTF8String.fromString(syms.get(i))); i += 1 }
  }
}
