package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.types._

/** Native count-min sketch over 64-bit keys: `cms_build(hash, depth,
  * width) -> binary` (aggregate) + `cms_query(cms, hash) -> bigint`
  * (scalar, codegen'd point estimate).
  *
  * The 100 TB role: FREQUENCY estimation without a full-cardinality
  * shuffle. The exact heavy-hitter spelling (`groupBy(token).count`)
  * exchanges one partial row per (partition, distinct key) — at corpus
  * scale that is the vocabulary, billions of rows. The sketch pass
  * collapses every partition to a fixed depth×width counter grid
  * (merge = element-wise ADD, fully distributive, byte-identical at any
  * parallelism), so frequency structure crosses the wire in kilobytes.
  * Estimates overestimate ONLY (collisions add, never subtract):
  * filtering the corpus by `cms_query >= T` yields a candidate SUPERSET
  * of the true ≥T keys, and an exact recount of just the candidates
  * restores exactness — the two-pass heavy-hitter pattern
  * ([[graft.operators.TextStats.heavyHitters]]), same shape as the
  * bloom decontamination pre-pass.
  *
  * Positions use the same Kirsch-Mitzenmacher double hashing as
  * [[Bloom]] (h1 + d·h2 over two splitmix64 finalizers) — feed it
  * `xxhash64(key)`. Layout: [int depth][int width][counters: long LE,
  * row-major d·width + pos].
  */
object CountMin {

  def update(counters: Array[Long], depth: Int, width: Int, value: Long): Unit = {
    val h1 = Bloom.mix(value)
    val h2 = Bloom.mix(value ^ 0x7f4a7c15ca62c1d6L) | 1L
    var d = 0
    while (d < depth) {
      val pos = (((h1 + d * h2) & Long.MaxValue) % width).toInt
      counters(d * width + pos) += 1L
      d += 1
    }
  }

  private def readIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Point estimate (min over rows) — called from generated code.
    * Header-validated: `cms_query` is a registered SQL function, so any
    * binary column can reach it; a malformed blob must fail
    * descriptively, not as an executor AIOOBE. */
  def query(cms: Array[Byte], value: Long): Long = {
    if (cms.length < 16)
      throw new IllegalArgumentException(
        s"cms_query: ${cms.length}-byte blob is not a count-min sketch (need >= 16)")
    val depth = readIntBE(cms, 0)
    val width = readIntBE(cms, 4)
    if (depth < 1 || depth > 8 || width < 1 ||
        cms.length != 8 + depth.toLong * width * 8)
      throw new IllegalArgumentException(
        s"cms_query: malformed sketch header (depth=$depth, width=$width, bytes=${cms.length})")
    val h1 = Bloom.mix(value)
    val h2 = Bloom.mix(value ^ 0x7f4a7c15ca62c1d6L) | 1L
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val pos = (((h1 + d * h2) & Long.MaxValue) % width).toInt
      val c = readLongLE(cms, 8 + ((d.toLong * width + pos) << 3).toInt)
      if (c < min) min = c
      d += 1
    }
    min
  }

  def serialize(counters: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val out = new Array[Byte](8 + counters.length * 8)
    out(0) = (depth >>> 24).toByte; out(1) = (depth >>> 16).toByte
    out(2) = (depth >>> 8).toByte; out(3) = depth.toByte
    out(4) = (width >>> 24).toByte; out(5) = (width >>> 16).toByte
    out(6) = (width >>> 8).toByte; out(7) = width.toByte
    var i = 0
    while (i < counters.length) {
      var v = counters(i); var b = 0
      while (b < 8) { out(8 + i * 8 + b) = v.toByte; v >>>= 8; b += 1 }
      i += 1
    }
    out
  }

  def deserializeCounters(bytes: Array[Byte]): Array[Long] = {
    val counters = new Array[Long]((bytes.length - 8) / 8)
    var i = 0
    while (i < counters.length) { counters(i) = readLongLE(bytes, 8 + i * 8); i += 1 }
    counters
  }
}

/** `cms_build(hash bigint, depth int, width int) -> binary`: builds the
  * serialized sketch as a distributive aggregate — partial buffers are
  * the fixed-size counter grid, merge is element-wise add, so the map
  * side collapses any partition before the exchange. Nulls are skipped;
  * an empty group yields the all-zero sketch (every estimate 0). */
case class CmsBuildAgg(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with TernaryLike[Expression] {

  override def prettyName: String = "cms_build"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure("cms_build: depth and width must be literals")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure("cms_build: depth and width must not be null")
        else if (depth <= 0 || depth > 8)
          TypeCheckResult.TypeCheckFailure(s"cms_build: depth must be in 1..8, got $depth")
        else if (width <= 0 || width > (1 << 22))
          TypeCheckResult.TypeCheckFailure(s"cms_build: width must be in 1..2^22, got $width")
        else TypeCheckResult.TypeCheckSuccess
      case (v, d, w) => TypeCheckResult.TypeCheckFailure(
        s"cms_build requires (bigint, int, int), got ($v, $d, $w)")
    }

  private lazy val depth: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = third.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) CountMin.update(buffer, depth, width, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = CountMin.serialize(buffer, depth, width)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    CountMin.serialize(buffer, depth, width)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.deserializeCounters(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CmsBuildAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `cms_query(cms binary, hash bigint) -> bigint` — codegen'd point
  * estimate; the sketch side is typically a literal, so the probe
  * inlines into the scan's WholeStageCodegen filter. Null in either
  * argument yields null (standard binary-expression contract). */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def prettyName: String = "cms_query"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_query requires (binary, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(cms: Any, value: Any): Any =
    CountMin.query(cms.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, v) => s"graft.expressions.CountMin.query($c, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsQuery =
    copy(left = newLeft, right = newRight)
}
