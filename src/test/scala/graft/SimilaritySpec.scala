package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.999f, 0.01f, 0.0f)), // near-parallel to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)))   // anti-parallel to 0
    .toDF("vec_id", "embedding")

  test("quantized cosine: parallel ≈ 1, orthogonal = 0, anti-parallel = -1") {
    val p = Similarity.prep(frame, col("vec_id"), col("embedding"))
    val top = Similarity.bruteTopK(p, p.filter(col("id") === 0), k = 3)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cos")).toMap
    assert(top(1L) > 0.99)
    assert(math.abs(top(2L)) < 1e-9)
    assert(math.abs(top(3L) + 1.0) < 1e-9)
  }

  test("top-k ranks by cosine desc with id tie-break and caps at k") {
    val p = Similarity.prep(frame, col("vec_id"), col("embedding"))
    val rows = Similarity.bruteTopK(p, p.filter(col("id") === 0), k = 2)
      .orderBy("rk").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
  }

  test("identical vectors share an LSH signature; signature is 8 bits") {
    val df = Seq((0L, Array(0.5f, -0.25f)), (1L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val p = Similarity.prep(df, col("vec_id"), col("embedding"))
    val sigs = p.select(Similarity.lshSignature(col("q")).as("s")).collect().map(_.getString(0))
    assert(sigs.distinct.length == 1)
    assert(sigs.head.length == 8 && sigs.head.forall(c => c == '0' || c == '1'))
    val pairs = Similarity.lshPairs(p).collect()
    assert(pairs.length == 1 && math.abs(pairs.head.getAs[Double]("cos") - 1.0) < 1e-9)
  }
}
