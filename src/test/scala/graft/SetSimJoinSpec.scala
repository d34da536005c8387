package graft

import graft.operators.SetSimJoin
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtered join's one contract is EXACTNESS: its pair set
  * equals brute force at every threshold, including pairs sitting right
  * on the boundary (the float-epsilon cases the prefix/length math
  * could drop).
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toDf(sets: Map[Long, Set[String]]) =
    sets.toSeq.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("id", "token")

  private def brute(sets: Map[Long, Set[String]], t: Double) =
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= t
    } yield (a, b)).toSet

  private def run(sets: Map[Long, Set[String]], t: Double) =
    SetSimJoin.similarPairs(toDf(sets), t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals brute force on a corpus with boundary pairs") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d", "e"),
      2L -> Set("a", "b", "c", "d", "x"),   // J(1,2) = 4/6 = 0.667
      3L -> Set("a", "b", "c"),             // J(1,3) = 3/5 = 0.6  (boundary)
      4L -> Set("p", "q", "r"),
      5L -> Set("p", "q", "r"),             // J(4,5) = 1.0
      6L -> Set("z"))
    assert(run(sets, 0.6) == brute(sets, 0.6))
    assert(run(sets, 0.6).contains((1L, 3L)), "boundary pair J=0.6 must survive")
    assert(run(sets, 0.7) == brute(sets, 0.7))
    assert(run(sets, 1.0) == brute(sets, 1.0))
  }

  test("jaccard values are the exact set ratios") {
    val sets = Map(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b", "c", "d", "e", "f"))  // J = 4/6
    val out = SetSimJoin.similarPairs(toDf(sets), 0.5).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 4.0 / 6.0)
  }

  test("guards: threshold range and reserved columns") {
    val df = Seq((1L, "a")).toDF("id", "token")
    intercept[IllegalArgumentException] { SetSimJoin.similarPairs(df, 0.0) }
    intercept[IllegalArgumentException] { SetSimJoin.similarPairs(df, 1.5) }
    intercept[IllegalArgumentException] {
      SetSimJoin.similarPairs(Seq((1L, "a", 2L)).toDF("id", "token", "__s"), 0.5)
    }
  }
}
