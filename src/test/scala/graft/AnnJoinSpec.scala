package graft

import graft.operators.{AnnJoin, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus×corpus ANN join: co-located cell join + bounded top-k,
  * with the data-adaptive GRID blocking for hot cells. The gates:
  * result parity against a naive within-cell brute force, blocked ==
  * unblocked (the grid changes the schedule, never the answer),
  * exactly-once pair enumeration (a duplicated pair would take two of
  * the k slots), and nprobe semantics at both extremes. */
class AnnJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 8
  private val Stride = 7

  /** Deterministic pseudo-random corpus: enough rows that the stride
    * quantizer yields several multi-member cells on both sides. */
  private def corpus(n: Int): DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      (i.toLong, Array.fill(Dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def cellsOf(n: Int): DataFrame =
    Similarity.ivfCellsMapSide(
      Similarity.prep(corpus(n), col("vec_id"), col("embedding")).cache(), Stride).cache()

  private def split(cells: DataFrame): (DataFrame, DataFrame) =
    (cells.filter(col("id") % 2 === 0), cells.filter(col("id") % 2 === 1))

  /** Naive expectation: per-cell cross join + window ranking. */
  private def naive(left: DataFrame, right: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val l = left.select(col("cell"), col("id").as("query_id"),
      col("q").as("qq"), col("norm").as("qnorm"))
    val scored = l.join(right, Seq("cell"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (Similarity.dotQ(col("qq"), col("q")).cast("double") /
          (col("qnorm") * col("norm"))).as("cos"))
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
  }

  private def result(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Int]("rk"))).toSet

  test("annJoin equals the naive within-cell ranking (healthy cells, no blocking)") {
    val (l, r) = split(cellsOf(300))
    assert(result(AnnJoin.annJoin(l, r, k = 3)) == naive(l, r, k = 3))
  }

  test("grid blocking changes the schedule, never the answer") {
    val (l, r) = split(cellsOf(300))
    val plain = AnnJoin.annJoin(l, r, k = 3)
    // blockPairs = 4: every non-trivial cell crosses the gate, so the
    // whole join runs through the gl×gr grid
    val blocked = AnnJoin.annJoin(l, r, k = 3, blockPairs = 4)
    assert(result(blocked) == result(plain))
    assert(result(blocked) == naive(l, r, k = 3))
  }

  test("grid enumeration is exactly-once: candidate multiset == per-cell pair products") {
    val (l, r) = split(cellsOf(300))
    val expected = l.groupBy("cell").agg(count(lit(1)).as("nl"))
      .join(r.groupBy("cell").agg(count(lit(1)).as("nr")), "cell")
      .agg(sum(col("nl") * col("nr"))).head.getLong(0)
    // pairs must be distinct as (query, neighbor) — a duplicate would
    // occupy two top-k slots — and total exactly the cell products
    Seq(4L, 4000000L).foreach { bp =>
      val cand = AnnJoin.scoredCandidates(l, r, blockPairs = bp)
      assert(cand.count() == expected, s"blockPairs=$bp: pair total")
      assert(cand.select("query_id", "neighbor_id").distinct().count() == expected,
        s"blockPairs=$bp: duplicated pair")
    }
  }

  test("annJoinProbe: nprobe=1 equals annJoin; nprobe=all cells equals brute force") {
    val all = cellsOf(240)
    val (l, r) = split(all)
    val cents = Similarity.strideCentroids(all, Stride).cache()
    val p1 = AnnJoin.annJoinProbe(l, r, cents, k = 3, nprobe = 1)
    assert(result(p1) == result(AnnJoin.annJoin(l, r, k = 3)))
    val nCells = cents.count().toInt
    val pAll = AnnJoin.annJoinProbe(l, r, cents, k = 3, nprobe = nCells)
    // probing every cell = exact search of the right side
    val brute = Similarity.bruteTopK(r, l, k = 3)
    assert(result(pAll) == result(brute))
  }

  test("a left row in an empty cell yields no rows (no null fabrication)") {
    val all = cellsOf(60)
    // left = everything, right = empty
    val none = AnnJoin.annJoin(all, all.filter(lit(false)), k = 3)
    assert(none.count() == 0)
  }
}
