package graft

import graft.operators.{MatView, SnapshotDiff}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance must be indistinguishable from a
  * from-scratch rebuild on the new snapshot — including group birth,
  * group death, rows moving between groups, and retraction of a
  * current MIN/MAX (the case delta arithmetic cannot express, routed
  * to affectedRefresh).
  */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // snapshots: (id, grp, v)
  private def snap(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "grp", "v")

  private val oldRows = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0),
    (4L, "b", 7.0), (5L, "c", 100.0), (6L, "c", 1.0))
  // vs old: id2 changed value, id3 moved b->d, id4 removed (b dies),
  // id5 removed (c keeps id6), id7 added to new group e, id6 untouched
  private val newRows = Seq(
    (1L, "a", 10.0), (2L, "a", 25.0), (3L, "d", 5.0),
    (6L, "c", 1.0), (7L, "e", 42.0))

  private def feedOf(o: DataFrame, n: DataFrame): DataFrame =
    SnapshotDiff.diffWithPayload(o, n, Seq("id"),
      SnapshotDiff.rowDigest(Seq(col("grp"), col("v").cast("decimal(18,2)"))))

  private val sums = Seq("sv" -> col("v").cast("decimal(18,2)"))

  private def canon(df: DataFrame): Seq[(String, Long, BigDecimal)] =
    df.select(col("grp"), col("cnt"), col("sv").cast("decimal(28,2)"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDecimal(2))))
      .sortBy(_._1).toSeq

  test("deltaRefresh == rebuild across birth, death, move, change") {
    val (o, n) = (snap(oldRows), snap(newRows))
    val view = MatView.build(o, Seq("grp"), sums)
    val refreshed = MatView.deltaRefresh(view, o, feedOf(o, n), Seq("id"), Seq("grp"), sums)
    assert(canon(refreshed) == canon(MatView.build(n, Seq("grp"), sums)))
    // groups b (all rows gone/moved) must be absent, e present
    val groups = refreshed.select("grp").as[String].collect().toSet
    assert(!groups.contains("b") && groups.contains("e"))
  }

  test("refresh output schema is a fixed point (refreshable forever)") {
    val (o, n) = (snap(oldRows), snap(newRows))
    val view = MatView.build(o, Seq("grp"), sums)
    val refreshed = MatView.deltaRefresh(view, o, feedOf(o, n), Seq("id"), Seq("grp"), sums)
    // names+types are the fixed point (nullability may widen: a decimal
    // CAST is nullable by Spark's overflow rules even when values fit)
    def shape(df: DataFrame) = df.schema.map(f => (f.name, f.dataType))
    assert(shape(refreshed) == shape(view),
      s"${refreshed.schema} vs ${view.schema}")
    val twice = MatView.deltaRefresh(refreshed, n, feedOf(n, n), Seq("id"), Seq("grp"), sums)
    assert(shape(twice) == shape(view))
  }

  test("chained refreshes track a snapshot sequence exactly") {
    val s0 = snap(oldRows)
    val s1 = snap(newRows)
    val s2 = snap(Seq((2L, "a", 25.0), (7L, "e", 43.0), (8L, "e", 1.0))) // id1,3,6 gone
    val v0 = MatView.build(s0, Seq("grp"), sums)
    val v1 = MatView.deltaRefresh(v0, s0, feedOf(s0, s1), Seq("id"), Seq("grp"), sums)
    val v2 = MatView.deltaRefresh(v1, s1, feedOf(s1, s2), Seq("id"), Seq("grp"), sums)
    assert(canon(v2) == canon(MatView.build(s2, Seq("grp"), sums)))
  }

  test("all-null sum inputs render as exact 0 in build and refresh alike") {
    val o = Seq((1L, "a", Some(3.0)), (2L, "b", None: Option[Double])).toDF("id", "grp", "v")
    val n = Seq((1L, "a", Some(3.0)), (2L, "b", None: Option[Double]),
      (3L, "b", None: Option[Double])).toDF("id", "grp", "v")
    val view = MatView.build(o, Seq("grp"), sums)
    val refreshed = MatView.deltaRefresh(view, o, feedOf(o, n), Seq("id"), Seq("grp"), sums)
    assert(canon(refreshed) == canon(MatView.build(n, Seq("grp"), sums)))
    val b = refreshed.filter(col("grp") === "b").select("cnt", "sv").collect().head
    assert(b.getLong(0) == 2 && b.getDecimal(1).compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  private val aggs = Seq(count(lit(1)).as("cnt"),
    min(col("v").cast("decimal(18,2)")).as("mn"),
    max(col("v").cast("decimal(18,2)")).as("mx"))

  private def canonMm(df: DataFrame): Seq[(String, Long, BigDecimal, BigDecimal)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3))))
      .sortBy(_._1).toSeq

  test("affectedRefresh survives retraction of the current max (and min)") {
    val (o, n) = (snap(oldRows), snap(newRows))
    // group c loses its max (id5=100.0) — delta arithmetic can't know the
    // runner-up is 1.0; affected recompute must
    val view = MatView.buildAggs(o, Seq("grp"), aggs)
    val refreshed = MatView.affectedRefresh(view, o, n, feedOf(o, n),
      Seq("id"), Seq("grp"), aggs)
    assert(canonMm(refreshed) == canonMm(MatView.buildAggs(n, Seq("grp"), aggs)))
  }

  test("affectedRefresh keeps untouched groups verbatim and drops dead ones") {
    val o = snap(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val n = snap(Seq((1L, "a", 1.0), (3L, "c", 9.0))) // b dies, a untouched
    val view = MatView.buildAggs(o, Seq("grp"), aggs)
    val refreshed = MatView.affectedRefresh(view, o, n, feedOf(o, n),
      Seq("id"), Seq("grp"), aggs)
    assert(canonMm(refreshed) == canonMm(MatView.buildAggs(n, Seq("grp"), aggs)))
    assert(!refreshed.select("grp").as[String].collect().contains("b"))
  }

  test("reserved-name guards") {
    val o = snap(oldRows)
    intercept[IllegalArgumentException] {
      MatView.build(o, Seq("grp"), Seq("cnt" -> col("v")))
    }
    intercept[IllegalArgumentException] {
      MatView.build(o, Seq("cnt"), Seq("sv" -> col("v")))
    }
  }
}
