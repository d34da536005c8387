package graft

import graft.operators.EditDist
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact edit-distance self-join: planted typo classes, the short
  * pool, and the loud pool bound — each compared against the local
  * brute-force reference. Random-corpus exhaustion (incl. the periodic
  * strings that stress the distinct-gram prefix) lives in
  * [[EditDistProps]]. */
class EditDistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private[graft] def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && math.abs(sa.length - sb.length) <= k
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet

  private def pairs(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    EditDist.similarPairs(rows.toDF("id", "s"), col("id"), col("s"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("substitution, insertion, deletion at k=1 and k=2 equal brute force") {
    val rows = Seq(
      1L -> "lavender spring",
      2L -> "lavender sprint", // substitution
      3L -> "lavender springs", // insertion
      4L -> "lavender sprin", // deletion
      5L -> "lavandar sprint", // dist 2 from #2
      6L -> "completely different")
    assert(pairs(rows, 1) == brute(rows, 1))
    assert(pairs(rows, 2) == brute(rows, 2))
    assert(!pairs(rows, 2).exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("short strings pair through the length-band pool; duplicates at dist 0") {
    val rows = Seq(1L -> "ab", 2L -> "ac", 3L -> "abc", 4L -> "xyz", 5L -> "ab")
    val k1 = pairs(rows, 1)
    assert(k1 == brute(rows, 1))
    assert(k1.contains((1L, 2L, 1L)))
    assert(k1.contains((1L, 5L, 0L)))
  }

  test("periodic strings (few distinct grams) still pair — no prefix false negative") {
    val rows = Seq(1L -> "abababab", 2L -> "abababab", 3L -> "ababacab",
      4L -> "babababa", 5L -> "cdcdcdcd")
    assert(pairs(rows, 1) == brute(rows, 1))
    assert(pairs(rows, 2) == brute(rows, 2))
  }

  test("the short pool bound fails loudly") {
    val rows = (1L to 50L).map(i => i -> s"a$i".take(3))
    val ex = intercept[IllegalArgumentException] {
      EditDist.similarPairs(rows.toDF("id", "s"), col("id"), col("s"),
        maxDist = 1, maxShortPool = 10).collect()
    }
    assert(ex.getMessage.contains("short pool"))
  }
}
