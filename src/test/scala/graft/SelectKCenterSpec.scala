package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Greedy k-center selection: hand-checked geometry, the
  * covering-radius ladder, lower-id tie-breaks, and the corpus-smaller-
  * than-k exhaustion path (the oracle gate covers the full corpus
  * values; these are the branches it cannot reach). */
class SelectKCenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("hand-checked picks and distances; ladder non-increasing") {
    // a=(0,0) seeds (min id); c=(0,4) is farthest (16e12); then b=(3,0)
    // joins at min(d(b,a)=9e12, d(b,c)=25e12) = 9e12
    val out = Similarity.selectKCenter(
        df(1L -> Seq(0f, 0f), 2L -> Seq(3f, 0f), 3L -> Seq(0f, 4f)),
        col("vec_id"), col("embedding"), k = 3)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1, 1L, 0L),
      (2, 3L, 16L * 1000000L * 1000000L),
      (3, 2L, 9L * 1000000L * 1000000L)))
    val ladder = out.drop(1).map(_._3)
    assert(ladder.zip(ladder.tail).forall { case (a, b) => b <= a },
      s"covering radius must be non-increasing: ${ladder.toSeq}")
  }

  test("equidistant candidates break to the lower id") {
    // b and c both at 9e12 from the seed — step 2 must pick id 2
    val out = Similarity.selectKCenter(
        df(1L -> Seq(0f, 0f), 3L -> Seq(0f, 3f), 2L -> Seq(3f, 0f)),
        col("vec_id"), col("embedding"), k = 2)
      .orderBy("step").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("corpus smaller than k emits exactly the corpus, no phantom steps") {
    val out = Similarity.selectKCenter(
        df(5L -> Seq(1f, 1f), 7L -> Seq(2f, 2f)),
        col("vec_id"), col("embedding"), k = 8)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((1, 5L), (2, 7L)))
  }
}
