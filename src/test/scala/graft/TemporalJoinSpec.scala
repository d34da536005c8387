package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** As-of join (union + keyed window) and bucketed range join: exact
  * boundary semantics, null handling, and — for the range join — that
  * interval replication across bucket boundaries loses no matches. */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLast: latest right row at/before each left ts, per key; none before -> null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // after both orders of key 10
      (2L, 10L, ts("2024-01-02 12:00:00")), // between them
      (3L, 10L, ts("2023-12-31 00:00:00")), // before any
      (4L, 20L, ts("2024-01-05 00:00:00"))) // key with no right rows
      .toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), "a"),
      (10L, ts("2024-01-03 00:00:00"), "b"),
      (30L, ts("2024-01-01 00:00:00"), "z")) // unreferenced key
      .toDF("rk", "rt", "payload")
    val out = AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("payload"))).toMap
    assert(out == Map(1L -> Some("b"), 2L -> Some("a"), 3L -> None, 4L -> None))
  }

  test("asofLast: rightTs == leftTs matches (at-or-before is inclusive)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:00"))).toDF("event_id", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), "same-instant")).toDF("rk", "rt", "payload")
    val out = AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("payload")).collect()
    assert(out.head.getAs[String]("payload") == "same-instant")
  }

  test("asofLast: null keys never match, on either side") {
    val left = Seq(
      (1L, Option(10L), ts("2024-01-05 00:00:00")),
      (2L, Option.empty[Long], ts("2024-01-05 00:00:00")))
      .toDF("event_id", "k", "t")
    val right = Seq(
      (Option(10L), ts("2024-01-01 00:00:00"), "a"),
      (Option.empty[Long], ts("2024-01-01 00:00:00"), "null-key"))
      .toDF("rk", "rt", "payload")
    val out = AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("payload"))).toMap
    // the null-keyed left row survives (left join) but matches nothing
    assert(out == Map(1L -> Some("a"), 2L -> None))
  }

  test("asofLast: a null right TIMESTAMP never matches (no carry onto the whole partition)") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, Option.empty[Timestamp], "ghost"),
      (10L, Option(ts("2024-01-01 00:00:00")), "real"))
      .map { case (k, t, p) => (k, t.orNull, p) }.toDF("rk", "rt", "payload")
    val out = AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("payload")).collect()
    // without the rt filter, the null-ts row sorts FIRST (nulls first)
    // and "ghost" would be carried; the match must be the real Jan-1 row
    assert(out.head.getAs[String]("payload") == "real")
  }

  test("asofLast: a genuine null in the LATEST right row survives; carry columns never mix rows") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"))).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:00"), Option("old-a"), Option(5L)),
      (10L, ts("2024-01-03 00:00:00"), Option.empty[String], Option(7L)))
      .map { case (k, t, a, b) => (k, t, a.orNull, b.map(Long.box).orNull) }
      .toDF("rk", "rt", "a", "b")
    val r = AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("a", "b")).collect().head
    // the latest (Jan-3) row is (null, 7): per-column ignoreNulls would
    // resurrect "old-a" from Jan-1 and emit the (old-a, 7) combination
    // that exists in no right row
    assert(r.getAs[String]("a") == null && r.getAs[Long]("b") == 7L)
  }

  test("asofLast: carry-name collision with a left column fails fast") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:00"))).toDF("payload", "k", "t")
    val right = Seq((10L, ts("2024-01-01 00:00:00"), "x")).toDF("rk", "rt", "payload")
    intercept[IllegalArgumentException] {
      AsofJoin.asofLast(left, "k", "t", right, "rk", "rt", Seq("payload"))
    }
  }

  test("pointInInterval: half-open [start, end) boundaries are exact") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == start: in
      (2L, ts("2024-01-01 01:59:59")), // just inside
      (3L, ts("2024-01-01 02:00:00")), // == end: out
      (4L, ts("2023-12-31 23:59:59"))) // before: out
      .toDF("pid", "pt")
    val intervals = Seq((100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L))
  }

  test("pointInInterval: an interval spanning many buckets matches points in every bucket") {
    // bucket width 1h, interval 10h: replicated to ~11 buckets
    val points = (0 until 12).map(h => (h.toLong, ts(f"2024-01-01 $h%02d:30:00"))).toDF("pid", "pt")
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:00:00"))).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(out == (0L until 10L).toSet) // 10:30 and 11:30 fall outside
  }

  test("pointInInterval: matches the naive inequality join on random data") {
    val rnd = new scala.util.Random(42)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (1 to 300).map(i => (i.toLong, new Timestamp(base + rnd.nextInt(1000000) * 1000L)))
      .toDF("pid", "pt")
    val intervals = (1 to 50).map { i =>
      val s = base + rnd.nextInt(1000000) * 1000L
      (i.toLong, new Timestamp(s), new Timestamp(s + rnd.nextInt(200000) * 1000L))
    }.toDF("iid", "s", "e")
    val bucketed = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 60)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("pt") >= col("s") && col("pt") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
  }

  test("intervalCountSum: matches pair-join + aggregate on random data (ties, nulls, empties)") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    // second-granularity timestamps force plenty of point==boundary ties
    val points = (1 to 400).map { i =>
      val v: java.lang.Double = if (i % 17 == 0) null else rnd.nextDouble() * 100
      (new Timestamp(base + rnd.nextInt(2000) * 1000L), v)
    }.toDF("pt", "v")
    val intervals = (1 to 80).map { i =>
      val s = base + rnd.nextInt(2000) * 1000L
      // some degenerate (len 0), some tiny (likely empty), some long
      val len = Seq(0, 1, 30, 600)(rnd.nextInt(4))
      (i.toLong, new Timestamp(s), new Timestamp(s + len * 1000L))
    }.toDF("iid", "s", "e")
    val naive = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 60)
      .groupBy("iid")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(30,8)")).as("sv"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), Option(r.getAs[java.math.BigDecimal]("sv"))
        .map(_.doubleValue())))).toMap
    val fast = RangeJoin.intervalCountSum(points, "pt", col("v"), intervals, "s", "e", 60)
      .collect()
      .map(r => (r.getAs[Long]("iid"), (r.getAs[Long]("n_points"),
        Option(r.getAs[java.math.BigDecimal]("sum_value")).map(_.doubleValue())))).toMap
    assert(fast == naive)
  }

  test("intervalCountSum: boundary ties are half-open exact; all-null-value window sums null") {
    val points = Seq(
      (ts("2024-01-01 00:00:00"), 1.0: java.lang.Double), // == start of iid 1: in
      (ts("2024-01-01 02:00:00"), 2.0: java.lang.Double), // == end of iid 1: out
      (ts("2024-01-01 05:00:00"), null: java.lang.Double) // only row of iid 2: null value
    ).toDF("pt", "v")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 04:30:00"), ts("2024-01-01 05:30:00")),
      (3L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00")) // empty: no row
    ).toDF("iid", "s", "e")
    val out = RangeJoin.intervalCountSum(points, "pt", col("v"), intervals, "s", "e", 3600)
      .collect().map(r => (r.getAs[Long]("iid"),
        (r.getAs[Long]("n_points"), Option(r.getAs[java.math.BigDecimal]("sum_value"))))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 1L && out(1L)._2.map(_.doubleValue()).contains(1.0))
    assert(out(2L) == (1L, None)) // counted, but no honest sum exists
  }

  test("intervalCountSum: the serial cross-bucket window's bucket bound fails loudly") {
    // 5 points an hour apart at width 60 s touch 5 distinct buckets;
    // a maxBuckets of 4 must refuse to run the single-task offsets
    // window rather than silently serialize an unbounded span
    val points = (0 until 5)
      .map(h => (ts(f"2024-01-01 0$h:00:00"), 1.0: java.lang.Double)).toDF("pt", "v")
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 05:00:00")))
      .toDF("iid", "s", "e")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalCountSum(points, "pt", col("v"), intervals, "s", "e",
        bucketWidthSec = 60, maxBuckets = 4)
    }
    assert(e.getMessage.contains("maxBuckets"))
    // the same span under the default bound still computes
    val ok = RangeJoin.intervalCountSum(points, "pt", col("v"), intervals, "s", "e", 60)
      .collect()
    assert(ok.length == 1 && ok.head.getAs[Long]("n_points") == 5L)
  }

  test("pointInInterval: degenerate (end <= start) intervals match nothing") {
    val points = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("pid", "pt")
    val intervals = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-02 00:00:00"), ts("2024-01-01 00:00:00"))).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, "pt", intervals, "s", "e", 3600).count() == 0)
  }
}
