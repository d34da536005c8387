package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `nearest_centroid(vec array<bigint>, norm double, cents array<bigint>,
  * cnorms array<double>) -> int` — the coarse-quantizer argmax as ONE
  * native codegen'd loop: index j (0-based) of the centroid maximizing
  * `dot(vec, cents[j·dim..]) / (norm · cnorms[j])`, ties to the LOWEST
  * index. `cents` is the flattened centroid model (k·dim longs,
  * centroid-major); `dim` derives from `vec`, `k` from `cnorms`.
  *
  * Why an expression and not a join: cell assignment against a bounded
  * centroid model is per-row work over driver-side state — the
  * join + `max_by` aggregate spelling pays a k×N row explosion and an
  * N-row exchange to rediscover that; a k-struct `array_max` spelling
  * is exchange-free but k QuantizedDot nodes blow past the JVM method
  * limit at real k and fall out of codegen into per-node interpreted
  * dispatch. This is the native shape: one tight two-level loop, no
  * allocation, fused into the scan's WholeStageCodegen. The model
  * arrives as an ordinary child — a literal while KBs, a
  * [[BroadcastRef]] when the index is big (the engine's standard
  * model-delivery split).
  *
  * The arithmetic is EXACTLY the aggregate path's: one long dot
  * (quantized values; |v| ≤ ~2·10⁶ ⇒ a 64-dim dot ≤ 3·10¹⁴ — exact in
  * both long and double), one double division per centroid, `>` compare
  * — so assignments are bit-identical to `ivfCells` (spec-pinned).
  *
  * Null contract: null if any ARGUMENT or any ELEMENT of `vec` is
  * null, and null if `norm` is not strictly positive — a zero-norm
  * (or NaN-norm) vector has no cosine direction, so its assignment is
  * undefined DATA, not an error. Model corruption is different: a null
  * model element or a non-positive / null centroid norm throws
  * IllegalArgumentException, as does shape misuse (cents not k·dim,
  * empty model) — caller bugs, not data.
  */
case class NearestCentroid(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), DoubleType, ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires (array<bigint>, double, array<bigint>, array<double>), " +
          s"got ($a, $b, $c, $d)")
    }

  override def nullSafeEval(v: Any, n: Any, c: Any, cn: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val norm = n.asInstanceOf[Double]
    val cents = c.asInstanceOf[ArrayData]
    val cnorms = cn.asInstanceOf[ArrayData]
    NearestCentroid.assign(vec, norm, cents, cnorms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, c, cn) => {
      // the row-hot loop lives in the static helper (shared with eval);
      // the boxed Integer return carries the element-null case
      val boxed = ctx.freshName("assigned")
      s"""
         |java.lang.Integer $boxed = graft.expressions.NearestCentroid.assignBoxed($v, $n, $c, $cn);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): NearestCentroid =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** `nearest_centroid_dbl(vec array<bigint>, norm double, cents
  * array<double>, cnorms array<double>) -> int` — [[NearestCentroid]]
  * against TRAINED (double) centroids: the k-means assign step and the
  * trained-IVF router. The dot accumulates `vec[i]·cents[j·dim+i]` in
  * index order — bit-identical to the `aggregate(zip_with(...))` fold
  * the join + `max_by` spelling evaluates, so swapping the aggregate
  * path for this expression cannot move a single assignment
  * (spec-pinned in SimilaritySpec). Null/shape contract matches
  * [[NearestCentroid]]. */
case class NearestCentroidDbl(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_dbl"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), DoubleType, ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid_dbl requires (array<bigint>, double, array<double>, array<double>), " +
          s"got ($a, $b, $c, $d)")
    }

  override def nullSafeEval(v: Any, n: Any, c: Any, cn: Any): Any =
    NearestCentroid.assignDblBoxed(v.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], cn.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, c, cn) => {
      val boxed = ctx.freshName("assigned")
      s"""
         |java.lang.Integer $boxed = graft.expressions.NearestCentroid.assignDblBoxed($v, $n, $c, $cn);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): NearestCentroidDbl =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object NearestCentroid {

  /** [[assignBoxed]] against double centroids; the dot accumulates in
    * index order (the HOF fold order — bit-identical swap). */
  def assignDblBoxed(vec: ArrayData, norm: Double, cents: ArrayData,
                     cnorms: ArrayData): java.lang.Integer = {
    val dim = vec.numElements()
    val k = cnorms.numElements()
    if (k == 0 || dim == 0 || cents.numElements() != dim.toLong * k)
      throw new IllegalArgumentException(
        s"nearest_centroid_dbl: model of ${cents.numElements()} doubles is not k=$k centroids of dim=$dim")
    if (!(norm > 0)) return null // zero/NaN-norm vector: no cosine direction (data, not error)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < k) {
      if (cnorms.isNullAt(j) || !(cnorms.getDouble(j) > 0))
        throw new IllegalArgumentException(
          s"nearest_centroid_dbl: null or non-positive norm for centroid $j — corrupt model")
      var dot = 0.0
      var p = 0
      val off = j * dim
      while (p < dim) {
        if (cents.isNullAt(off + p))
          throw new IllegalArgumentException(s"nearest_centroid_dbl: null model element at ${off + p}")
        dot += vec.getLong(p) * cents.getDouble(off + p)
        p += 1
      }
      val c = dot / (norm * cnorms.getDouble(j))
      if (c > best) { best = c; bestJ = j } // ties keep the LOWEST index
      j += 1
    }
    Integer.valueOf(bestJ)
  }

  /** Row-hot argmax (called from generated code and eval). Returns null
    * (boxed) iff `vec` contains a null element. */
  def assignBoxed(vec: ArrayData, norm: Double, cents: ArrayData,
                  cnorms: ArrayData): java.lang.Integer = {
    val dim = vec.numElements()
    val k = cnorms.numElements()
    if (k == 0 || dim == 0 || cents.numElements() != dim.toLong * k)
      throw new IllegalArgumentException(
        s"nearest_centroid: model of ${cents.numElements()} longs is not k=$k centroids of dim=$dim")
    if (!(norm > 0)) return null // zero/NaN-norm vector: no cosine direction (data, not error)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var best = Double.NegativeInfinity
    var bestJ = 0
    var j = 0
    while (j < k) {
      if (cnorms.isNullAt(j) || !(cnorms.getDouble(j) > 0))
        throw new IllegalArgumentException(
          s"nearest_centroid: null or non-positive norm for centroid $j — corrupt model")
      var dot = 0L
      var p = 0
      val off = j * dim
      while (p < dim) {
        if (cents.isNullAt(off + p))
          throw new IllegalArgumentException(s"nearest_centroid: null model element at ${off + p}")
        dot += vec.getLong(p) * cents.getLong(off + p)
        p += 1
      }
      val c = dot.toDouble / (norm * cnorms.getDouble(j))
      if (c > best) { best = c; bestJ = j } // ties keep the LOWEST index
      j += 1
    }
    Integer.valueOf(bestJ)
  }

  def assign(vec: ArrayData, norm: Double, cents: ArrayData, cnorms: ArrayData): Any =
    assignBoxed(vec, norm, cents, cnorms)
}
