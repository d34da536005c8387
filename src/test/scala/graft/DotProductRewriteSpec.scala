package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must rewrite the built-in dot-product spelling to
  * the native expression — and ONLY that spelling. */
class DotProductRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def longPairs = Seq(
    (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
    (Array(-7L, 0L), Array(3L, 9L))).toDF("a", "b")

  test("builtin spelling optimizes to quantized_dot and computes the same values") {
    // literal frames constant-fold to a LocalRelation (which itself
    // proves the rewrite evaluated); a range-backed frame keeps the
    // expression visible in the optimized plan
    val df = spark.range(3).select(
      array(col("id") + 1, col("id") + 2).as("a"),
      array(col("id") + 3, col("id") + 4).as("b"))
    val q = df.select(Similarity.dotQBuiltin(col("a"), col("b")).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("quantized_dot("),
      s"expected the rewrite in:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with("), optimized)
    val expected = df.select(Similarity.dotQ(col("a"), col("b"))).collect().map(_.getLong(0)).toSeq
    assert(q.collect().map(_.getLong(0)).toSeq == expected)
    // and the literal case folds to the right VALUES through the rewrite
    assert(longPairs.select(Similarity.dotQBuiltin(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq == Seq(32L, -21L))
  }

  test("the rewrite fires inside SQL text too") {
    val optimized = spark.sql(
      """SELECT aggregate(zip_with(array(1L, 2L), array(3L, 4L), (x, y) -> x * y),
        |  0L, (acc, v) -> acc + v) AS d""".stripMargin)
      .queryExecution.optimizedPlan.toString
    // constant-folding may pre-compute the literal case; accept either
    // the rewritten expression or the folded result
    assert(optimized.contains("quantized_dot(") || optimized.contains("11"), optimized)
  }

  test("double arrays are NOT rewritten (contract is array<bigint> only)") {
    val df = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
    val q = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("quantized_dot("))
    assert(q.head.getDouble(0) == 13.0)
  }

  test("a non-identity finish lambda is NOT rewritten") {
    val q = longPairs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v, acc -> acc + 1L) AS d")
    assert(!q.queryExecution.optimizedPlan.toString.contains("quantized_dot("))
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(33L, -20L))
  }

  test("a non-product zip lambda is NOT rewritten") {
    val q = longPairs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y), lit(0L), (acc, v) => acc + v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("quantized_dot("))
  }

  test("ANSI zip-then-fold order survives: an overflowing product throws even when a null elsewhere would null the fold") {
    // builtin: zip_with computes EVERY product (index 1 overflows →
    // throws) before the fold sees the null at index 0; the rewritten
    // expression must do the same, not short-circuit to null
    assume(spark.conf.get("spark.sql.ansi.enabled") == "true")
    // non-foldable inputs: literals would be constant-folded (and throw)
    // during optimization, before the rewrite's runtime is exercised
    val big = lit(4000000000L) + col("id")
    val df = spark.range(1).select(
      array(when(col("id") < 0, lit(0L)), big).as("a"), // element 0 is null at runtime
      array(lit(1L) + col("id"), big).as("b"))
    val q = df.select(Similarity.dotQBuiltin(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("quantized_dot("))
    val e = intercept[Exception] { q.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("overflow") || m.contains("multiplyExact")), e.toString)
    // and without overflow, a null element still nulls the result
    val ok = Seq((Array[java.lang.Long](null, 2L), Array[java.lang.Long](1L, 3L))).toDF("a", "b")
      .select(col("a").cast("array<bigint>").as("a"), col("b").cast("array<bigint>").as("b"))
      .select(Similarity.dotQBuiltin(col("a"), col("b")))
    assert(ok.head.isNullAt(0))
  }

  test("null contract survives the rewrite: ragged lengths and null elements → null") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(10L, 10L)),
      (Array(1L, 2L), Array(10L, 10L))).toDF("a", "b")
    val rows = df.select(Similarity.dotQBuiltin(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 30L)
  }
}
