package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix sum must equal the (unscalable) whole-frame
  * window spelling, independent of input partitioning; packing slices
  * the concatenated stream at budget boundaries. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = (1L to 100L).map(i => (i, (i * 7) % 13 + 1)).toDF("id", "v")

  test("running total equals the single-partition window spelling") {
    val dist = PrefixSum.withRunningTotal(df, Seq(col("id")), col("v"), "rt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val win = df.withColumn("rt",
      sum(col("v")).over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dist == win)
  }

  test("withDenseIdAndRunningTotal equals DenseId + withRunningTotal composed (r18 fusion)") {
    val fused = PrefixSum.withDenseIdAndRunningTotal(
      df.repartition(7), Seq(col("v"), col("id")), col("v"), "pos", "rt",
      tieBreaker = Some(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val composed = {
      val ordered = graft.operators.DenseId.withDenseId(
        df.repartition(3), Seq(col("v"), col("id")), "pos")
      PrefixSum.withRunningTotal(ordered, Seq(col("pos")), col("v"), "rt",
        tieBreaker = Some(col("pos")))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    }
    assert(fused == composed)
  }

  test("output is independent of the input's physical partitioning") {
    val a = PrefixSum.withRunningTotal(df.repartition(1), Seq(col("id")), col("v"), "rt")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = PrefixSum.withRunningTotal(df.repartition(7), Seq(col("id")), col("v"), "rt")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("packing: bins slice the stream at budget boundaries; straddlers bin by START offset") {
    // lengths 5,5,5 with budget 12: starts 0,5,10 → bins 0,0,0; next
    // start 15 → bin 1
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "len")
    val out = PrefixSum.packByBudget(docs, Seq(col("id")), col("len"), 12L, "bin")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("null values contribute 0: the row keeps its predecessor's running total") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .map { case (id, v) => (id, v.map(Long.box).orNull) }.toDF("id", "v")
    val out = PrefixSum.withRunningTotal(df, Seq(col("id")), col("v"), "rt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("ties on orderCols are broken deterministically by the content-hash tiebreaker") {
    // every row ties on the declared order column; the xxhash64
    // tiebreaker must make the two internal passes agree on ONE total
    // order — the emitted totals are then the prefix sums of v in that
    // order (each row's total = predecessor's total + its own v)
    val tied = (1L to 50L).map(i => (0, i, i % 7 + 1)).toDF("k", "id", "v").repartition(8)
    val out = PrefixSum.withRunningTotal(tied, Seq(col("k")), col("v"), "rt")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val inOrder = out.sortBy(_._3)
    val running = inOrder.map(_._2).scanLeft(0L)(_ + _).tail
    assert(inOrder.map(_._3).sameElements(running),
      "running totals are not the prefix sums of any single total order")
    // and repeated runs agree exactly (no pass-to-pass interleaving drift)
    val again = PrefixSum.withRunningTotal(tied, Seq(col("k")), col("v"), "rt")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == out.toSet)
  }

  test("duplicate column names require an explicit tieBreaker; passing one works") {
    val dup = Seq((1L, 2L), (2L, 3L)).toDF("id", "v")
      .select(col("id"), col("v"), col("v")) // two columns literally named v
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(dup, Seq(col("id")), col("id"), "rt")
    }
    assert(e.getMessage.contains("duplicate column names"))
    val out = PrefixSum.withRunningTotal(dup, Seq(col("id")), col("id") * 0 + 2, "rt",
      tieBreaker = Some(col("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 2L, 2L -> 4L))
  }

  test("reserved internal column names are rejected instead of silently corrupting output") {
    val clash = Seq((1L, 2L)).toDF("id", "__v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(clash, Seq(col("id")), col("id"), "rt")
    }
    assert(e.getMessage.contains("reserved"))
    val tb0 = Seq((1L, 2L)).toDF("id", "__tb0")
    val e2 = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(tb0, Seq(col("id")), col("id"), "rt")
    }
    assert(e2.getMessage.contains("reserved"))
    // only the EXACT generated names are reserved: an unrelated __tbx
    // column is legal (regression — a prefix check rejected it)
    val tbx = Seq((1L, 5L), (2L, 7L)).toDF("id", "__tbx")
    val ok = PrefixSum.withRunningTotal(tbx, Seq(col("id")), col("__tbx"), "rt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ok == Map(1L -> 5L, 2L -> 12L))
  }

  test("column names containing dots survive the tiebreaker pass") {
    val dotted = Seq((1L, 2L), (2L, 3L)).toDF("id", "meta.src")
    val out = PrefixSum.withRunningTotal(dotted, Seq(col("id")), col("`meta.src`"), "rt")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 5L))
  }

  test("packing: an oversized row occupies its own bin range without failing") {
    val docs = Seq((1L, 3L), (2L, 40L), (3L, 3L)).toDF("id", "len")
    val out = PrefixSum.packByBudget(docs, Seq(col("id")), col("len"), 10L, "bin")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("bin")).toMap
    // starts: 0, 3, 43 → bins 0, 0, 4
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }
}
