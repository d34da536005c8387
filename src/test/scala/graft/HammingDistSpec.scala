package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native hamming_dist expression: values, null contract, codegen,
  * and the banded simhash pair matcher built on it. */
class HammingDistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts differing positions; zero for equal strings") {
    val r = spark.sql(
      "SELECT hamming_dist('0110', '0101'), hamming_dist('abc', 'abc')").head
    assert(r.getInt(0) == 2 && r.getInt(1) == 0)
  }

  test("null on ragged lengths and on null inputs") {
    val r = spark.sql(
      "SELECT hamming_dist('011', '01'), hamming_dist(CAST(NULL AS STRING), '01')").head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("whole-stage codegen survives the expression and matches the interpreter") {
    val df = spark.range(50).select(
      concat(lit("sig"), col("id") % 7).as("a"),
      concat(lit("sig"), col("id") % 3).as("b"))
    val q = df.select(call_function("hamming_dist", col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hamming_dist("),
      s"expected hamming_dist inside a codegen stage in:\n$plan")
    val expected = df.collect().map { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      a.zip(b).count { case (x, y) => x != y }
    }.toSeq
    assert(q.collect().map(_.getInt(0)).toSeq == expected)
  }

  test("simhashPairs: within-radius pairs found (pigeonhole recall), distant pairs excluded") {
    val sigs = Seq(
      (1L, "0000000000000000"),
      (2L, "0000000000000011"), // dist 2 from 1 → pair
      (3L, "0000000000000001"), // dist 1 from 1, dist 1 from 2 → pairs
      (4L, "1111111111111111")) // far from everything
      .toDF("id", "simhash")
    val pairs = graft.operators.Dedup.simhashPairs(sigs, maxDist = 2, sigLen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 2), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("simhashPairs fails LOUDLY when signatures are narrower than the declared width") {
    // 16-char signatures with sigLen=32 would silently bucket every row
    // together via empty tail bands — the operator must raise instead
    val sigs = Seq((1L, "0000000000000000"), (2L, "1111111111111111")).toDF("id", "simhash")
    val e = intercept[Exception] {
      graft.operators.Dedup.simhashPairs(sigs, maxDist = 2, sigLen = 32).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("sigLen")), e.toString)
  }
}
