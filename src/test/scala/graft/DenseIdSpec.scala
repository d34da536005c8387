package graft

import graft.operators.DenseId
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DenseIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P2: ids are dense 1..n and follow the order columns") {
    val df = Seq(("c", 30), ("a", 10), ("b", 20), ("d", 40))
      .toDF("k", "v").repartition(3) // scramble physical order
    val out = DenseId.withDenseId(df, Seq(col("k")), "item_id")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("item_id")).toMap
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("P2: dense over many partitions — no gaps, no duplicates") {
    val df = (1 to 1000).map(i => (i * 7919 % 1000, i)).toDF("k", "v").repartition(8)
    val ids = DenseId.withDenseId(df, Seq(col("k"), col("v")), "item_id")
      .collect().map(_.getAs[Long]("item_id")).sorted
    assert(ids.toSeq == (1L to 1000L))
  }
}
