package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native bounded-state top-k aggregate: correctness vs the window
  * spelling, tie determinism at any parallelism, null skipping, and the
  * k-bound on partial state. */
class TopKBySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    GraftFunctions.ensure(spark)
    df.groupBy("g")
      .agg(call_function("top_k_by", col("s"), col("p"), lit(k)).as("top"))
  }

  test("matches the window row_number spelling, regardless of input partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map(i => (i % 5, rnd.nextInt(100).toDouble, i.toLong))
    for (parts <- Seq(1, 32)) {
      val df = rows.toDF("g", "s", "p").repartition(parts)
      val got = topk(df, 3).collect().map { r =>
        r.getInt(0) -> r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1)))
      }.toMap
      val expected = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("g").orderBy(col("s").desc, col("p"))
        rows.toDF("g", "s", "p")
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .collect().groupBy(_.getInt(0))
          .view.mapValues(_.sortBy(_.getInt(3)).map(r => (r.getDouble(1), r.getLong(2))).toSeq).toMap
      }
      assert(got == expected, s"parts=$parts")
    }
  }

  test("ties on score resolve to the smaller payload, deterministically") {
    val df = Seq((0, 5.0, 9L), (0, 5.0, 2L), (0, 5.0, 7L), (0, 1.0, 1L))
      .toDF("g", "s", "p").repartition(8)
    val top = topk(df, 2).collect().head.getSeq[Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(top == Seq((5.0, 2L), (5.0, 7L)))
  }

  test("null scores and payloads are skipped; an all-null group yields an empty array") {
    val df = Seq(
      (0, Some(3.0), Some(1L)), (0, None, Some(2L)), (0, Some(4.0), None),
      (1, Option.empty[Double], Option.empty[Long]))
      .map { case (g, s, p) => (g, s.map(Double.box).orNull, p.map(Long.box).orNull) }
      .toDF("g", "s", "p")
    val got = topk(df, 3).collect()
      .map(r => r.getInt(0) -> r.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(got == Map(0 -> Seq((3.0, 1L)), 1 -> Seq()))
  }

  test("fewer than k items returns them all, best-first") {
    val df = Seq((0, 1.0, 1L), (0, 9.0, 2L)).toDF("g", "s", "p")
    val top = topk(df, 5).collect().head.getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1)))
    assert(top == Seq((9.0, 2L), (1.0, 1L)))
  }

  test("partial state is bounded by k (serialized buffer never exceeds k entries)") {
    val buf = new graft.expressions.TopKBuffer(3)
    (1 to 1000).foreach(i => buf.add(i.toLong, i.toLong))
    assert(buf.sortedBestFirst.toSeq == Seq((1000L, 1000L), (999L, 999L), (998L, 998L)))
    // 4-byte count + 3 * 16 bytes — O(k), not O(n)
    assert(buf.toBytes.length == 4 + 3 * 16)
    // merge keeps the bound and the global best
    val other = new graft.expressions.TopKBuffer(3)
    Seq(2000L -> 1L, 500L -> 2L).foreach { case (s, p) => other.add(s, p) }
    buf.mergeFrom(other)
    assert(buf.sortedBestFirst.toSeq == Seq((2000L, 1L), (1000L, 1000L), (999L, 999L)))
  }

  test("bigint scores rank exactly — including above 2^53 where a double cast collapses") {
    GraftFunctions.ensure(spark)
    val big = 1L << 53
    // big and big+1 are the SAME double; as bigint scores they must rank apart
    val df = Seq((0, big + 1L, 1L), (0, big, 2L), (0, big - 1L, 3L))
      .toDF("g", "s", "p").repartition(4)
    val top = topk(df, 2).collect().head.getSeq[Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(top == Seq((big + 1L, 1L), (big, 2L)))
    // descending on the negated score = ascending distance — the ADC path
    val asc = df.groupBy("g")
      .agg(call_function("top_k_by", -col("s"), col("p"), lit(2)).as("top"))
      .collect().head.getSeq[Row](1).map(x => (-x.getLong(0), x.getLong(1)))
    assert(asc == Seq((big - 1L, 3L), (big, 2L)))
  }

  test("sortable double bits: an order-preserving involution across sign, zero, infinity, NaN") {
    import graft.expressions.TopKBy.{fromSortable, toSortable}
    val vals = Seq(Double.NegativeInfinity, -1e300, -1.5, -Double.MinPositiveValue, -0.0,
      0.0, Double.MinPositiveValue, 1.5, 1e300, Double.PositiveInfinity, Double.NaN)
    vals.foreach(v => assert(java.lang.Double.compare(fromSortable(toSortable(v)), v) == 0,
      s"roundtrip broke $v"))
    vals.sliding(2).foreach { case Seq(a, b) =>
      assert(toSortable(a) < toSortable(b), s"order broke between $a and $b")
    }
  }

  test("non-literal or non-positive k fails analysis") {
    GraftFunctions.ensure(spark)
    val df = Seq((0, 1.0, 1L)).toDF("g", "s", "p")
    intercept[Exception] {
      df.groupBy("g").agg(expr("top_k_by(s, p, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("top_k_by(s, p, g)")).collect()
    }
    // a null literal k must be a clean analysis error, not an analyzer NPE
    val e = intercept[Exception] {
      df.groupBy("g").agg(expr("top_k_by(s, p, CAST(NULL AS INT))")).collect()
    }
    assert(!e.isInstanceOf[NullPointerException], s"analyzer NPE: $e")
  }
}
