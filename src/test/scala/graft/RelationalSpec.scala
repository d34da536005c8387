package graft

import graft.functions.Prompts
import graft.operators.{PoolAssign, Validate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("J4: pool assignment is a bijection per pool cycle and deterministic") {
    val records = (1 to 12).map(i => Tuple1(i.toLong)).toDF("idx")
    val pool = Seq("u1", "u2", "u3", "u4").toDF("k")
    val out = PoolAssign.assign(records, col("idx"), pool, "k", "user", a = 7L, b = 2L)
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[String]("user")).toMap
    // 12 records over a 4-pool: each pool member used exactly 3 times
    assert(out.values.groupBy(identity).values.map(_.size).toSet == Set(3))
    // deterministic: same inputs → same assignment
    val out2 = PoolAssign.assign(records, col("idx"), pool, "k", "user", a = 7L, b = 2L)
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[String]("user")).toMap
    assert(out == out2)
    // rows with idx ≡ same slot (mod n) get the same pool member
    assert(out(1L) == out(5L) && out(5L) == out(9L))
  }

  test("J4: non-coprime multiplier is rejected (not a bijection)") {
    val records = Seq(Tuple1(1L)).toDF("idx")
    val pool = Seq("a", "b", "c", "d").toDF("k")
    intercept[IllegalArgumentException] {
      PoolAssign.assign(records, col("idx"), pool, "k", "u", a = 6L, b = 0L)
    }
  }

  test("P8: validation lists every missing column, passes on match") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Validate.requireColumns(df, Seq("id", "price", "date"))
    }
    assert(e.getMessage.contains("price") && e.getMessage.contains("date"))
    assert(Validate.requireColumns(df, Seq("id", "name")) eq df)
    val e2 = intercept[IllegalArgumentException] {
      Validate.requireSchema(df, Map("id" -> DoubleType))
    }
    assert(e2.getMessage.contains("expected DoubleType"))
    Validate.requireSchema(df, Map("id" -> LongType, "name" -> StringType))
  }

  test("approx_count_distinct stays within its error bound vs exact") {
    val df = (1 to 20000).map(i => (i % 7, i % 3000)).toDF("g", "k")
    val out = df.groupBy("g")
      .agg(approx_count_distinct(col("k"), 0.02).as("approx"),
        countDistinct(col("k")).as("exact"))
      .collect()
    out.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("F1: prompt fold renders lines in id order within each batch") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (4L, "d")).toDF("item_id", "review")
    val out = Prompts.fold(df, col("item_id"),
      format_string("id : %d , review : %s", col("item_id"), col("review")), 3)
      .collect().map(r => r.getAs[Long]("batch_id") -> r.getAs[String]("prompt")).toMap
    assert(out(0L) == "id : 1 , review : a\nid : 2 , review : b\nid : 3 , review : c")
    assert(out(1L) == "id : 4 , review : d")
  }
}
