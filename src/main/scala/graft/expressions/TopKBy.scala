package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `top_k_by(score double|bigint, payload bigint, k) -> array<struct<
  * score, payload>>` — per-group top-k as a native BOUNDED-STATE
  * aggregate.
  *
  * Why an aggregate and not a window: with few groups and many items,
  * `row_number() OVER (PARTITION BY group)` funnels every group's full
  * item set through one task's sort — the low-cardinality-group version
  * of the whole-frame window problem. A `collect_list`-then-slice
  * spelling is as bad: partial buffers hold EVERY item. This aggregate
  * keeps at most k entries per group per partial buffer (a bounded
  * min-heap), so map-side partials shuffle k rows per partition per
  * group no matter how many items a group has, and merges are k+k heap
  * unions. State: O(k) always; the 100 TB per-group top-k shape.
  *
  * Score type: `double` (cosines, revenues) or `bigint` (exact integer
  * distances — negate for ascending order; long negation is exact where
  * a cast to double above 2^53 would not be). Both rank identically:
  * doubles ride an order-preserving bijection into sortable longs
  * (Lucene's `sortableDoubleBits`), so the buffer compares plain longs
  * either way and NaN keeps Spark/DuckDB's sorts-greatest convention.
  *
  * Determinism: ranked by (score desc, payload asc) — equal scores tie-
  * break on the payload, so results are stable at any parallelism. Null
  * score or payload rows are skipped (SQL aggregate null contract).
  * Returns the (possibly < k) kept entries best-first; empty array for
  * an all-null group.
  */
case class TopKBy(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  override def prettyName: String = "top_k_by"
  override def nullable: Boolean = false
  override def dataType: DataType = TopKBy.resultType(first.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType | LongType, LongType, IntegerType) =>
        if (!third.foldable)
          TypeCheckResult.TypeCheckFailure("top_k_by: k must be a literal")
        else if (third.eval() == null) // before k: intValue on null NPEs
          TypeCheckResult.TypeCheckFailure("top_k_by: k must not be null")
        else if (k <= 0)
          TypeCheckResult.TypeCheckFailure(s"top_k_by: k must be positive, got $k")
        else TypeCheckResult.TypeCheckSuccess
      case (s, p, kk) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by requires (double|bigint, bigint, int), got ($s, $p, $kk)")
    }

  private lazy val k: Int = third.eval().asInstanceOf[Number].intValue()
  private lazy val doubleScore: Boolean = first.dataType == DoubleType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = first.eval(input)
    val p = second.eval(input)
    if (s != null && p != null) {
      val key = if (doubleScore) TopKBy.toSortable(s.asInstanceOf[Double])
                else s.asInstanceOf[Long]
      buffer.add(key, p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, p) =>
      InternalRow(if (doubleScore) TopKBy.fromSortable(s) else s, p)
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKBy =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TopKBy {
  def resultType(scoreType: DataType): DataType = ArrayType(StructType(Seq(
    StructField("score", scoreType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  /** Order-preserving double→long bijection (its own inverse): flips the
    * low 63 bits of negative doubles so SIGNED long comparison matches
    * `Double.compare` — -0.0 lands just below +0.0, NaN above +Inf. */
  def toSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d) // canonical NaN: all NaNs rank equal
    bits ^ ((bits >> 63) & Long.MaxValue)
  }

  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
}

/** Bounded top-k state: a min-heap (by keep-worthiness) of at most k
  * (sortKey, payload) pairs — the head is the WORST kept entry, evicted
  * when something better arrives. Better = higher key, ties to the
  * SMALLER payload. Keys are longs: raw bigint scores, or doubles via
  * [[TopKBy.toSortable]]. */
final class TopKBuffer(k: Int) {
  // head = worst kept entry (lowest key; ties: largest payload)
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
    new Ordering[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })

  private def better(a: (Long, Long), b: (Long, Long)): Boolean = {
    val c = java.lang.Long.compare(a._1, b._1)
    if (c != 0) c > 0 else a._2 < b._2
  }

  def add(key: Long, payload: Long): Unit = {
    val cand = (key, payload)
    if (heap.size < k) heap.enqueue(cand)
    else if (better(cand, heap.head)) {
      heap.dequeue()
      heap.enqueue(cand)
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, p) => add(s, p) }

  def sortedBestFirst: Array[(Long, Long)] =
    heap.toArray.sortWith(better)

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + heap.size * 16)
    bb.putInt(heap.size)
    heap.foreach { case (s, p) => bb.putLong(s); bb.putLong(p) }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.add(bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }
}
