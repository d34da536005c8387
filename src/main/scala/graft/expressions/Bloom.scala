package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.types._

/** Native Bloom filter over 64-bit keys: `bloom_build(hash, numBits,
  * numHashes) -> binary` (aggregate) + `bloom_contains(bloom, hash) ->
  * boolean` (scalar, codegen'd).
  *
  * The 100 TB role: a compact SET MEMBERSHIP sketch for filter
  * PRE-PASSES — ~`numBits/n` bits per member vs ~50 bytes per entry in
  * a broadcast hash relation, so a key set 1-2 orders of magnitude too
  * big to broadcast-join still broadcasts as a bloom, and the corpus
  * side stays a narrow codegen'd scan filter (no shuffle, no join) that
  * discards the clean majority before any exact machinery runs. False
  * positives only, never false negatives: a downstream exact check on
  * the (tiny) positive set restores exactness — see
  * [[graft.operators.Dedup.bloomDecontaminate]].
  *
  * Determinism: bit-OR construction is commutative/associative, so the
  * serialized filter is byte-identical at any parallelism or row order
  * (spec-pinned). Layout: [int numHashes][int numBits][words: long LE].
  * Positions use Kirsch-Mitzenmacher double hashing (h1 + i·h2) over
  * two splitmix64 finalizers — i.e. the input is treated as already
  * uniformly hashed (feed it `xxhash64(key)`), and the two mixers
  * decorrelate the probe sequence from the input hash.
  */
object Bloom {

  /** splitmix64 finalizer — full-avalanche 64-bit mixer. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def setBits(words: Array[Long], numBits: Int, numHashes: Int, value: Long): Unit = {
    val h1 = mix(value)
    val h2 = mix(value ^ 0x7f4a7c15ca62c1d6L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
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

  /** Row-hot membership probe (called from generated code). Validates
    * the header against the blob so a malformed/foreign binary fails
    * with a descriptive error instead of an executor AIOOBE or
    * divide-by-zero — `bloom_contains` is a registered SQL function,
    * so arbitrary binary columns can reach it. */
  def contains(bloom: Array[Byte], value: Long): Boolean = {
    if (bloom.length < 16)
      throw new IllegalArgumentException(
        s"bloom_contains: ${bloom.length}-byte blob is not a bloom filter (need >= 16)")
    val numHashes = readIntBE(bloom, 0)
    val numBits = readIntBE(bloom, 4)
    if (numHashes < 1 || numHashes > 16 || numBits < 1 ||
        bloom.length != 8 + (((numBits + 63) >>> 6) << 3))
      throw new IllegalArgumentException(
        s"bloom_contains: malformed filter header (numHashes=$numHashes, " +
          s"numBits=$numBits, bytes=${bloom.length})")
    val h1 = mix(value)
    val h2 = mix(value ^ 0x7f4a7c15ca62c1d6L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (((h1 + i * h2) & Long.MaxValue) % numBits).toInt
      if ((readLongLE(bloom, 8 + ((pos >>> 6) << 3)) >>> (pos & 63) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](8 + words.length * 8)
    out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
    out(4) = (numBits >>> 24).toByte; out(5) = (numBits >>> 16).toByte
    out(6) = (numBits >>> 8).toByte; out(7) = numBits.toByte
    var w = 0
    while (w < words.length) {
      var v = words(w); var i = 0
      while (i < 8) { out(8 + w * 8 + i) = v.toByte; v >>>= 8; i += 1 }
      w += 1
    }
    out
  }

  def deserializeWords(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((bytes.length - 8) / 8)
    var w = 0
    while (w < words.length) { words(w) = readLongLE(bytes, 8 + w * 8); w += 1 }
    words
  }
}

/** `bloom_build(hash bigint, numBits int, numHashes int) -> binary`:
  * builds the serialized filter as a distributive aggregate — partial
  * buffers are the fixed-size bit array, merge is word-wise OR, so the
  * map side collapses any partition to `numBits/8` bytes before the
  * exchange. Nulls are skipped; an empty group yields the empty filter
  * (matches nothing). */
case class BloomBuildAgg(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with TernaryLike[Expression] {

  override def prettyName: String = "bloom_build"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure("bloom_build: numBits and numHashes must be literals")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure("bloom_build: numBits and numHashes must not be null")
        else if (numBits <= 0 || numBits > (1 << 30))
          TypeCheckResult.TypeCheckFailure(s"bloom_build: numBits must be in 1..2^30, got $numBits")
        else if (numHashes <= 0 || numHashes > 16)
          TypeCheckResult.TypeCheckFailure(s"bloom_build: numHashes must be in 1..16, got $numHashes")
        else TypeCheckResult.TypeCheckSuccess
      case (v, b, h) => TypeCheckResult.TypeCheckFailure(
        s"bloom_build requires (bigint, int, int), got ($v, $b, $h)")
    }

  private lazy val numBits: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val numHashes: Int = third.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits + 63) >>> 6)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) Bloom.setBits(buffer, numBits, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Bloom.serialize(buffer, numBits, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    Bloom.serialize(buffer, numBits, numHashes)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.deserializeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomBuildAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `bloom_contains(bloom binary, hash bigint) -> boolean` — codegen'd
  * membership probe; the bloom side is typically a (small) literal, so
  * the probe inlines into the scan's WholeStageCodegen filter. Null in
  * either argument yields null (standard binary-expression contract). */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (binary, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(bloom: Any, value: Any): Any =
    Bloom.contains(bloom.asInstanceOf[Array[Byte]], value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.expressions.Bloom.contains($b, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
