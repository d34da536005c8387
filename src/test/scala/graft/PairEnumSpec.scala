package graft

import graft.operators.PairEnum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The blocked triangular self-join under every LSH candidate
  * enumeration: exact pair-set equivalence with the naive bucket
  * self-join, at block sizes that force multi-block buckets. */
class PairEnumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference semantics: plain self-join, a.id < b.id. */
  private def naive(assign: DataFrame, bucketCols: Seq[String]): Set[(Long, Long)] =
    assign.as("a")
      .join(assign.as("b"),
        bucketCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def blocked(assign: DataFrame, bucketCols: Seq[String], blockSize: Int): Seq[(Long, Long)] =
    PairEnum.bucketPairs(assign, bucketCols, blockSize = blockSize)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("heavy bucket: every pair exactly once, matching the naive join") {
    // one 50-row bucket (1225 pairs), one 3-row bucket, two singletons
    val assign = ((1L to 50L).map(i => (i, 0, "hot")) ++
      Seq((100L, 0, "warm"), (101L, 0, "warm"), (102L, 0, "warm"),
        (200L, 0, "cold"), (201L, 1, "cold")))
      .toDF("id", "band_idx", "band_val")
    val want = naive(assign, Seq("band_idx", "band_val"))
    // blockSize 8 forces g = ceil(50/8) = 7 blocks on the hot bucket
    val got = blocked(assign, Seq("band_idx", "band_val"), blockSize = 8)
    assert(got.size == got.distinct.size, "a pair was emitted twice within one bucket")
    assert(got.toSet == want)
    assert(want.size == 1225 + 3)
  }

  test("multi-band membership re-emits per shared bucket, like the naive join (caller distincts)") {
    // ids 1,2 share TWO bands; ids 3,4 share one
    val assign = Seq(
      (1L, 0, "x"), (2L, 0, "x"), (1L, 1, "y"), (2L, 1, "y"),
      (3L, 2, "z"), (4L, 2, "z")).toDF("id", "band_idx", "band_val")
    val got = blocked(assign, Seq("band_idx", "band_val"), blockSize = 2)
    assert(got.sorted == Seq((1L, 2L), (1L, 2L), (3L, 4L)))
  }

  test("payload columns ride with their id: _a belongs to the smaller id") {
    val assign = Seq(
      (5L, "bucket1", "sig5"), (9L, "bucket1", "sig9"), (2L, "bucket1", "sig2"))
      .toDF("id", "bv", "sig")
    val rows = PairEnum.bucketPairs(assign, Seq("bv"), payloadCols = Seq("sig"), blockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      (2L, 5L, "sig2", "sig5"), (2L, 9L, "sig2", "sig9"), (5L, 9L, "sig5", "sig9")))
  }

  test("randomized bucket sizes straddling the block size: set equivalence at several block sizes") {
    val rnd = new scala.util.Random(7)
    // 12 buckets, sizes 1..40 — some under, some far over small block sizes
    val assign = (0 until 12).flatMap { b =>
      val size = 1 + rnd.nextInt(40)
      (0 until size).map(i => (b * 1000L + i, b % 3, s"bucket$b"))
    }.toDF("id", "band_idx", "band_val")
    val want = naive(assign, Seq("band_idx", "band_val"))
    Seq(2, 3, 7, 4096).foreach { bs =>
      val got = blocked(assign, Seq("band_idx", "band_val"), blockSize = bs)
      assert(got.size == got.distinct.size, s"duplicate pair at blockSize=$bs")
      assert(got.toSet == want, s"pair-set mismatch at blockSize=$bs")
    }
  }

  test("reserved internal column names are rejected loudly") {
    val df = Seq((1L, "x")).toDF("id", "bv")
    intercept[IllegalArgumentException](
      PairEnum.bucketPairs(df.withColumn("__i", lit(1)), Seq("bv")))
    intercept[IllegalArgumentException](
      PairEnum.bucketPairs(df, Seq("bv"), blockSize = 1))
  }

  test("no task owns a full heavy bucket: per-cell pair volume is bounded") {
    // 64-row single bucket at blockSize 8 → g = 8: the largest triangular
    // cell enumerates at most ~2·8 rows → ≤ 8·8 pairs, vs 2016 naive
    val assign = (1L to 64L).map(i => (i, 0, "hot")).toDF("id", "band_idx", "band_val")
    val g = 8
    // actual (hash-assigned, uneven) block sizes bound each cell:
    // bi·bj off-diagonal, C(bi,2) on the diagonal — all far below the
    // naive single-task 2016
    val sizes = assign.select(pmod(xxhash64(col("id")), lit(g)).as("blk"))
      .groupBy("blk").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bound = (for (i <- 0L until g; j <- i until g) yield
      if (i == j) sizes.getOrElse(i, 0L) * (sizes.getOrElse(i, 0L) - 1) / 2
      else sizes.getOrElse(i, 0L) * sizes.getOrElse(j, 0L)).max
    val perCell = PairEnum.bucketPairs(assign, Seq("band_idx", "band_val"), blockSize = 8)
      .withColumn("cell",
        concat(pmod(xxhash64(col("id_a")), lit(g)), lit(":"), pmod(xxhash64(col("id_b")), lit(g))))
      .groupBy("cell").count().agg(max("count")).head().getLong(0)
    assert(bound < 2016, s"degenerate hash split: bound=$bound")
    assert(perCell <= bound, s"a single cell enumerated $perCell pairs (bound $bound)")
  }
}
