package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Profile, SnapshotDiff}

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("a"), Some(2.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(-1.0))
  ).toDF("id", "s", "x")

  test("Profile.columns: exact counts, nulls, distinct, typed min/max legs") {
    val rows = Profile.columns(frame).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows.keySet == Set("id", "s", "x"))
    val id = rows("id")
    assert(id.getAs[Long]("n_rows") == 4 && id.getAs[Long]("n_nulls") == 0)
    assert(id.getAs[Long]("n_distinct") == 4)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 4.0)
    assert(id.isNullAt(id.fieldIndex("min_str")))
    val s = rows("s")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("n_distinct") == 2)
    assert(s.getAs[String]("min_str") == "a" && s.getAs[String]("max_str") == "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val x = rows("x")
    assert(x.getAs[Long]("n_nulls") == 1 && x.getAs[Long]("n_distinct") == 2)
    assert(x.getAs[Double]("min_num") == -1.0 && x.getAs[Double]("max_num") == 2.5)
  }

  test("Profile.columnsApprox: same counts/min/max, distinct within HLL error") {
    val n = 5000
    val df = spark.range(n.toLong).select(
      col("id"), (col("id") % 97).cast("string").as("s"))
    val exact = Profile.columns(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val approx = Profile.columnsApprox(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    for (c <- Seq("id", "s")) {
      assert(approx(c).getAs[Long]("n_rows") == exact(c).getAs[Long]("n_rows"))
      assert(approx(c).getAs[Long]("n_nulls") == exact(c).getAs[Long]("n_nulls"))
      val (e, a) = (exact(c).getAs[Long]("n_distinct"), approx(c).getAs[Long]("n_distinct"))
      assert(math.abs(a - e) <= math.max(1L, (e * 0.15).toLong),
        s"$c: approx $a vs exact $e")
    }
    assert(approx("id").getAs[Double]("max_num") == (n - 1).toDouble)
  }

  test("Profile.columns rejects unsupported column types with a clear error") {
    val df = Seq((1L, Array(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException](Profile.columns(df))
    assert(e.getMessage.contains("arr"))
  }

  test("Profile.columns: dotted column names and DATE columns profile correctly") {
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-02")),
      (2L, java.sql.Date.valueOf("2024-03-04"))
    ).toDF("a.b", "d")
    val rows = Profile.columns(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(rows("a.b").getAs[Long]("n_distinct") == 2)
    assert(rows("a.b").getAs[Double]("max_num") == 2.0)
    // dates profile as epoch millis (UTC midnight)
    assert(rows("d").getAs[Double]("min_num") ==
      java.time.LocalDate.parse("2024-01-02").toEpochDay * 86400000.0)
  }

  test("columnsSketch + mergeProfiles: disjoint slice profiles merge to the whole-frame profile") {
    val df = spark.range(4000L).select(
      col("id"),
      when(col("id") % 10 =!= 0, (col("id") % 321).cast("string")).as("s"),
      (col("id") % 77 + 0.5).as("x"))
    val whole = Profile.columns(df).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    // two disjoint slices (e.g. two ingest days), profiled separately
    val slices = Profile.columnsSketch(df.filter(col("id") < 1500))
      .unionAll(Profile.columnsSketch(df.filter(col("id") >= 1500)))
    val merged = Profile.mergeProfiles(slices).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(merged.keySet == whole.keySet)
    for (c <- merged.keySet) {
      // counts and min/max fold exactly; distinct is the HLL estimate
      assert(merged(c).getAs[Long]("n_rows") == whole(c).getAs[Long]("n_rows"))
      assert(merged(c).getAs[Long]("n_nulls") == whole(c).getAs[Long]("n_nulls"))
      val (e, a) = (whole(c).getAs[Long]("n_distinct"), merged(c).getAs[Long]("n_distinct"))
      assert(math.abs(a - e) <= math.max(2L, (e * 0.05).toLong), s"$c: merged $a vs exact $e")
    }
    assert(merged("x").getAs[Double]("min_num") == 0.5)
    assert(merged("x").getAs[Double]("max_num") == 76.5)
    assert(merged("s").getAs[String]("max_str") == whole("s").getAs[String]("max_str"))
  }

  private def snap(rows: Seq[(Long, Option[String], Option[String])]) =
    rows.toDF("k", "v1", "v2")

  test("SnapshotDiff: classifies added/removed/changed, drops unchanged") {
    val oldS = snap(Seq(
      (1L, Some("a"), Some("b")),   // unchanged
      (2L, Some("a"), Some("b")),   // changed (v2)
      (3L, Some("x"), None),        // removed
      (5L, Some("a"), None)))       // changed (null -> value)
    val newS = snap(Seq(
      (1L, Some("a"), Some("b")),
      (2L, Some("a"), Some("c")),
      (4L, Some("y"), Some("z")),   // added
      (5L, Some("a"), Some("q"))))
    def d(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__d", SnapshotDiff.rowDigest(Seq(df("v1"), df("v2"))))
    val got = SnapshotDiff.diff(d(oldS), d(newS), Seq("k"), col("__d"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added"), (5L, "changed")))
  }

  test("rowDigest: null position matters (no concat_ws null-skip collision)") {
    val df = Seq(
      (1L, Some("a"), Option.empty[String]),
      (2L, Option.empty[String], Some("a"))
    ).toDF("k", "v1", "v2")
    val ds = df.select(SnapshotDiff.rowDigest(Seq(col("v1"), col("v2"))).as("d"))
      .collect().map(_.getString(0))
    assert(ds(0) != ds(1), "null-position collision: (a,null) digests equal (null,a)")
  }

  test("applyChanges(old, diffWithPayload(old, new)) reconstructs new EXACTLY") {
    val oldS = snap(Seq(
      (1L, Some("a"), Some("b")),
      (2L, Some("a"), Some("b")),
      (3L, Some("x"), None)))
    val newS = snap(Seq(
      (1L, Some("a"), Some("b")),       // unchanged
      (2L, Some("a"), Some("c")),       // changed
      (4L, Some("y"), Option.empty[String])))  // added (with a null field)
    val dig = SnapshotDiff.rowDigest(Seq(col("v1"), col("v2")))
    val feed = SnapshotDiff.diffWithPayload(oldS, newS, Seq("k"), dig)
    // removed keys carry null payload; added/changed carry the new row
    val byKey = feed.collect().map(r => r.getAs[Long]("k") ->
      (r.getAs[String]("change_type"), r.getAs[String]("v1"))).toMap
    assert(byKey(3L) == ("removed", null) && byKey(4L) == ("added", "y"))
    val applied = SnapshotDiff.applyChanges(oldS, feed, Seq("k"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v1"), r.getAs[String]("v2"))).toSet
    val expected = newS.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v1"), r.getAs[String]("v2"))).toSet
    assert(applied == expected)
  }

  test("rowDigest: length prefix blocks separator/sentinel injection") {
    // without netstring framing these three pairs concat identically
    val df = Seq(
      (1L, Some("a\u0001b"), Some("c")),
      (2L, Some("a"), Some("b\u0001c")),
      (3L, Some("\u0002"), Option.empty[String]),
      (4L, Option.empty[String], Option.empty[String])
    ).toDF("k", "v1", "v2")
    val ds = df.orderBy("k")
      .select(SnapshotDiff.rowDigest(Seq(col("v1"), col("v2"))).as("d"))
      .collect().map(_.getString(0))
    assert(ds(0) != ds(1), "separator injection shifted field boundaries undetected")
    assert(ds(2) != ds(3), "literal sentinel value collides with NULL")
  }
}
