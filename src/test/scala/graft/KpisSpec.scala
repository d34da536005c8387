package graft

import graft.operators.{Kpis, MinMax}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests on literal frames for the KPI family (SURVEY.md §5.2):
  * A2 null-skip counting, P4 divisor guard, A4 degenerate normalize. */
class KpisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def facts = Seq(
    // id "a": 2 positive, 1 negative, 1 null → likeness 2.0
    ("a", 10.0, Some(true)), ("a", 20.0, Some(true)),
    ("a", 30.0, Some(false)), ("a", 40.0, None),
    // id "b": all null → 0 positive, 0 negative → divisor guard → 0.0
    ("b", 50.0, None), ("b", 70.0, None))
    .toDF("id", "price", "sentiment")

  test("A2: positive/negative counts skip nulls (Polars bool-sum semantics)") {
    val out = Kpis.userKpis(facts).collect().map(r =>
      r.getAs[String]("id") -> (r.getAs[Long]("positive_reviews"), r.getAs[Long]("negative_reviews"))).toMap
    assert(out("a") == ((2L, 1L)))
    assert(out("b") == ((0L, 0L)))
  }

  test("P4/A3: likeness divisor guard — negative=0 divides by 1, not 0") {
    val out = Kpis.userKpis(facts).collect().map(r =>
      r.getAs[String]("id") -> r.getAs[Double]("likeness_score")).toMap
    assert(out("a") == 2.0) // 2 / max(1,1)
    assert(out("b") == 0.0) // 0 / 1 — no NaN, no null
  }

  test("A4: min-max over the group scores; average is exact") {
    val rows = Kpis.userKpis(facts).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(rows("a").getAs[Double]("normalized_likeness_score") == 1.0)
    assert(rows("b").getAs[Double]("normalized_likeness_score") == 0.0)
    assert(rows("a").getAs[Double]("average_spent") == 25.0)
    assert(rows("b").getAs[Double]("average_spent") == 60.0)
  }

  test("A4 degenerate: constant column normalizes to all 0.0 (tools.py:85-87)") {
    val df = Seq(("x", 5.0), ("y", 5.0), ("z", 5.0)).toDF("k", "v")
    val out = MinMax.normalize(df, "v", "n").collect()
    assert(out.forall(_.getAs[Double]("n") == 0.0))
  }

  test("A4: normalize maps min→0, max→1, midpoint→0.5") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val out = MinMax.normalize(df, "v", "n").collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Double]("n")).toMap
    assert(out(1.0) == 0.0 && out(2.0) == 0.5 && out(3.0) == 1.0)
  }

  test("T3 batch: dateKpis groups by the raw date string") {
    val df = Seq(("2024-01-01", 10.0, Some(true)), ("2024-01-01", 20.0, Some(false)),
      ("2024-01-02", 40.0, None)).toDF("date", "price", "sentiment")
    val out = Kpis.dateKpis(df).collect()
      .map(r => r.getAs[String]("date") -> r.getAs[Double]("average_profit_per_day")).toMap
    assert(out == Map("2024-01-01" -> 15.0, "2024-01-02" -> 40.0))
  }
}
