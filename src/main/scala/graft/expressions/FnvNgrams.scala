package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fnv_ngrams(text string, n int, dim int) -> array<bigint>` — the
  * FNV-1a-hashed buckets of every length-`n` codepoint window of
  * `text`, in order: element j is
  * `FNV1a32(cp[j], …, cp[j+n-1]) mod dim` (fastText's feature-hashing
  * function, Joulin et al. 2016). ONE native pass per row, because the
  * declarative spellings are all quadratic or interpreted: a
  * per-window positional `substr(text, i, n)` re-scans the string's
  * byte prefix per window (UTF8String positions are codepoint-indexed
  * — O(L²) per document, measured 3.4-5.6 s on the sf0.1 corpus), and
  * a HOF transform runs its lambda interpreted per element. This
  * expression walks the codepoints once: O(L·n) integer ops (measured
  * sub-second on the same surface — the [[WhtHash]] promotion
  * precedent).
  *
  * Hashes CODEPOINTS, not UTF-8 bytes (identical on ASCII, the oracled
  * domain) — the same domain the SQL mirror's `ascii(substr(…))` fold
  * reads, so both engines agree on any input; a byte-level variant is
  * a one-line swap off the oracled path.
  *
  * Null contract: null text → null; `n`/`dim` must be foldable
  * positive literals. A text shorter than `n` yields an empty array. */
case class FnvNgrams(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fnv_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure("fnv_ngrams: n and dim must be literals")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure("fnv_ngrams: n and dim must not be null")
        else if (n <= 0 || dim <= 0)
          TypeCheckResult.TypeCheckFailure(
            s"fnv_ngrams: n and dim must be positive, got n=$n dim=$dim")
        else TypeCheckResult.TypeCheckSuccess
      case (t, nn, d) => TypeCheckResult.TypeCheckFailure(
        s"fnv_ngrams requires (string, int, int), got ($t, $nn, $d)")
    }

  private lazy val n: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val dim: Int = third.eval().asInstanceOf[Number].intValue()

  override def nullSafeEval(t: Any, nn: Any, d: Any): Any =
    FnvNgrams.buckets(t.asInstanceOf[UTF8String],
      nn.asInstanceOf[Int], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nn, d) =>
      s"${ev.value} = graft.expressions.FnvNgrams.buckets($t, $nn, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FnvNgrams =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FnvNgrams {
  val Offset = 2166136261L
  val Prime = 16777619L
  private val Mask = 0xffffffffL

  /** Shared by interpreted eval and generated code (hence public). */
  def buckets(text: UTF8String, n: Int, dim: Int): ArrayData = {
    val s = text.toString
    // codepoint array once; windows slide over it
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    val m = cps.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m)
      var j = 0
      while (j < m) {
        var h = Offset
        var k = 0
        while (k < n) {
          h = ((h ^ cps(j + k)) * Prime) & Mask
          k += 1
        }
        out(j) = h % dim
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
