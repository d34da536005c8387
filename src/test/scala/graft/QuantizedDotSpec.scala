package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native QuantizedDot expression must be value-identical to the
  * built-in zip_with + aggregate spelling, null-safe, and registered in
  * both the declarative (spark.sql.extensions) and imperative routes. */
class QuantizedDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs = Seq(
    (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),      // 4+10+18 = 32
    (Array(-7L, 0L), Array(3L, 9L)),             // -21
    (Array(1000000L, 1000000L), Array(1000000L, 1000000L)), // 2e12 — no overflow
    (Array.empty[Long], Array.empty[Long]))      // 0
    .toDF("a", "b")

  test("matches the built-in zip_with+aggregate spelling on every row") {
    val rows = pairs.select(
      Similarity.dotQ(col("a"), col("b")).as("native"),
      Similarity.dotQBuiltin(col("a"), col("b")).as("builtin")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(32L, -21L, 2000000000000L, 0L))
  }

  test("length mismatch yields null, matching zip_with's null padding") {
    val df = Seq((Array(2L, 3L, 100L), Array(10L, 10L))).toDF("a", "b")
    val r = df.select(
      Similarity.dotQ(col("a"), col("b")).as("native"),
      Similarity.dotQBuiltin(col("a"), col("b")).as("builtin")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null array yields null") {
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(df.select(Similarity.dotQ(col("a"), col("b"))).head.isNullAt(0))
  }

  test("null ELEMENT yields null, matching the built-in spelling") {
    val r = spark.sql(
      "SELECT quantized_dot(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L)) AS native, " +
        "aggregate(zip_with(array(1L, CAST(NULL AS BIGINT)), array(2L, 3L), (x, y) -> x * y), " +
        "0L, (acc, v) -> acc + v) AS builtin").head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("declarative registration: expr parses via spark.sql.extensions") {
    // TestSpark sets spark.sql.extensions=graft.GraftExtensions, so SQL
    // text resolves without the imperative ensure() path.
    val r = spark.sql("SELECT quantized_dot(array(2L, 3L), array(5L, 7L))").head.getLong(0)
    assert(r == 31L)
  }

  test("whole-stage codegen survives the native expression") {
    // a literal frame constant-folds to LocalTableScan; range() forces a
    // real codegen stage through the expression
    // (array() is codegen-friendly; transform() is CodegenFallback and
    // would break the span on its own)
    val df = spark.range(100).select(
      array(col("id"), col("id") * 2, col("id") * 3).as("a"),
      array(col("id") + 1, col("id") + 2, col("id") + 3).as("b"))
    val q = df.select(Similarity.dotQ(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [quantized_dot("),
      s"expected quantized_dot inside a codegen stage in:\n$plan")
    // and the generated code computes the same value as the interpreter
    val expected = df.select(Similarity.dotQBuiltin(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(q.collect().map(_.getLong(0)).toSeq == expected)
  }
}
