package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: a user who speaks only `spark.sql(...)` gets
  * the whole engine — tables as temp views, the native extension
  * functions resolvable by name, and the optimizer rewrite applying to
  * SQL-authored plans too. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native functions resolve from SQL text: top_k_by, hamming_dist, quantized_dot") {
    GraftFunctions.ensure(spark)
    import spark.implicits._
    Seq((0, 1.0, 10L), (0, 3.0, 11L), (0, 2.0, 12L))
      .toDF("g", "s", "p").createOrReplaceTempView("scores")
    val top = spark.sql(
      "SELECT top_k_by(s, p, 2) AS top FROM scores GROUP BY g")
      .head.getSeq[Row](0).map(r => (r.getDouble(0), r.getLong(1)))
    assert(top == Seq((3.0, 11L), (2.0, 12L)))
    assert(spark.sql("SELECT hamming_dist('1100', '1001')").head.getInt(0) == 2)
    assert(spark.sql(
      "SELECT quantized_dot(array(1L, 2L), array(3L, 4L))").head.getLong(0) == 11L)
    // the coarse-quantizer argmax pair resolves from SQL text too
    assert(spark.sql(
      "SELECT nearest_centroid(array(9L, 1L), sqrt(82.0D), array(10L, 0L, 0L, 10L), " +
        "array(10.0D, 10.0D))").head.getInt(0) == 0)
    assert(spark.sql(
      "SELECT nearest_centroid_dbl(array(1L, 9L), sqrt(82.0D), array(10.0D, 0.0D, 0.0D, 10.0D), " +
        "array(10.0D, 10.0D))").head.getInt(0) == 1)
  }

  test("a SQL-authored query over the harness tables matches the DataFrame spelling") {
    val sf = "/root/testdata/sf0.001"
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS s
        |FROM lineitem_v GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(graft.operators.StableAgg.ssum(col("l_quantity")).as("s"))
      .orderBy("l_returnflag")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(sql == df)
  }
}
