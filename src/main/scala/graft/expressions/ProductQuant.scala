package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization primitives — the memory side of ANN at 100 TB.
  *
  * A 64-dim float vector is 256 bytes; its PQ code (m=4 subspaces, one
  * codeword index each) is m small ints — a 32-64× compression that is
  * what lets a billion-vector index live in executor memory. Encoding
  * and asymmetric-distance scoring are the two per-row hot loops (N
  * rows to encode, N·|Q| pairs to score), so both are native codegen'd
  * expressions per the engine's preference order: compose built-ins <
  * native Expression < UDF (never). A HOF spelling of the encode would
  * interpret m·ksub·dsub lambda steps per row (see the q_text_repetition
  * lesson in PLANS.md); this is a tight primitive loop.
  *
  * All arithmetic is EXACT-INTEGER over the engine's quantized vectors
  * (`graft.operators.Similarity.quantize`): squared-L2 distances of
  * longs, so codes and ADC distances are bit-identical across engines
  * and sit on the DuckDB-oracled path. |q| ≤ ~2·10⁶ per element ⇒ a
  * subspace distance ≤ (4·10¹²)·dsub and an ADC sum ≤ that ·m — far
  * from 2⁶³ for any plausible (dim, scale).
  */
object ProductQuant {
  /** Codebook layout contract: flattened `[(j·ksub + c)·dsub + i]` —
    * subspace-major, then codeword, then position. `cb.length =
    * ksub · dim`, so ksub is derivable and only m is passed. */
  val LayoutDoc = "cb[(j*ksub + c)*dsub + i]"
}

/** `pq_encode(vec: array<bigint>, codebook: array<bigint>, m: int) ->
  * array<int>` — per-subspace argmin of exact integer squared-L2
  * against the codebook, ties to the LOWEST codeword index.
  *
  * Null contract: null if any argument or any ELEMENT of either array
  * is null. Shape misuse (dim not divisible by m, codebook length not
  * ksub·dim) throws `IllegalArgumentException` — that is a caller bug,
  * not data. */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (array<bigint>, array<bigint>, int), got ($a, $b, $c)")
    }

  override def nullSafeEval(v: Any, c: Any, mAny: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val m = mAny.asInstanceOf[Int]
    val dim = vec.numElements()
    if (m <= 0 || dim % m != 0 || cb.numElements() % dim != 0 || cb.numElements() == 0)
      throw new IllegalArgumentException(
        s"pq_encode: dim=$dim not divisible into m=$m subspaces with codebook of ${cb.numElements()}")
    val dsub = dim / m
    val ksub = cb.numElements() / dim
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < cb.numElements()) { if (cb.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Long.MaxValue
      var bestC = 0
      var cc = 0
      while (cc < ksub) {
        var d = 0L
        var p = 0
        while (p < dsub) {
          val diff = vec.getLong(j * dsub + p) - cb.getLong((j * ksub + cc) * dsub + p)
          d += diff * diff
          p += 1
        }
        if (d < best) { best = d; bestC = cc }
        cc += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, m) => {
      val dim = ctx.freshName("dim")
      val dsub = ctx.freshName("dsub")
      val ksub = ctx.freshName("ksub")
      val codes = ctx.freshName("codes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cc = ctx.freshName("cc")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      s"""
         |int $dim = $v.numElements();
         |if ($m <= 0 || $dim % $m != 0 || $c.numElements() % $dim != 0 || $c.numElements() == 0) {
         |  throw new IllegalArgumentException("pq_encode: dim=" + $dim +
         |    " not divisible into m=" + $m + " subspaces with codebook of " + $c.numElements());
         |}
         |int $dsub = $dim / $m;
         |int $ksub = $c.numElements() / $dim;
         |for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |  if ($v.isNullAt($i)) ${ev.isNull} = true;
         |}
         |for (int $i = 0; $i < $c.numElements() && !${ev.isNull}; $i++) {
         |  if ($c.isNullAt($i)) ${ev.isNull} = true;
         |}
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    long $best = Long.MAX_VALUE;
         |    int $bestC = 0;
         |    for (int $cc = 0; $cc < $ksub; $cc++) {
         |      long $d = 0L;
         |      for (int $p = 0; $p < $dsub; $p++) {
         |        long $diff = $v.getLong($j * $dsub + $p) - $c.getLong(($j * $ksub + $cc) * $dsub + $p);
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $best) { $best = $d; $bestC = $cc; }
         |    }
         |    $codes[$j] = $bestC;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `pq_adc(codes: array<int>, table: array<bigint>) -> bigint` —
  * asymmetric-distance lookup: `Σ_j table[j·ksub + codes[j]]` where
  * `ksub = table.length / codes.length` and `table` holds the query's
  * precomputed subspace distances to every codeword (same layout as the
  * codebook, distances in place of codewords).
  *
  * Null contract: null if any argument or element is null. An
  * out-of-range code or a table length not divisible by m throws —
  * corrupt codes are a pipeline bug to surface, not data to null away. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || table.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"pq_adc: table of ${table.numElements()} entries is not m=$m subspaces")
    val ksub = table.numElements() / m
    var acc = 0L
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val code = codes.getInt(j)
      if (code < 0 || code >= ksub)
        throw new IllegalArgumentException(s"pq_adc: code $code outside [0, $ksub)")
      val idx = j * ksub + code
      if (table.isNullAt(idx)) return null
      acc += table.getLong(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  throw new IllegalArgumentException("pq_adc: table of " + $b.numElements() +
         |    " entries is not m=" + $m + " subspaces");
         |}
         |int $ksub = $b.numElements() / $m;
         |long $acc = 0L;
         |for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $code = $a.getInt($j);
         |  if ($code < 0 || $code >= $ksub) {
         |    throw new IllegalArgumentException("pq_adc: code " + $code + " outside [0, " + $ksub + ")");
         |  }
         |  int $idx = $j * $ksub + $code;
         |  if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |  $acc += $b.getLong($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
