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

  test("the short pool bound fails loudly (maxDist >= 2 general path)") {
    val rows = (1L to 50L).map(i => i -> s"a$i".take(3))
    val ex = intercept[IllegalArgumentException] {
      EditDist.similarPairs(rows.toDF("id", "s"), col("id"), col("s"),
        maxDist = 2, maxShortPool = 10).collect()
    }
    assert(ex.getMessage.contains("short pool"))
  }

  test("maxDist = 1 deletion-neighborhood path has no short-pool bound — short strings just pair") {
    // 50 strings of length <= 3 would trip a maxShortPool = 10 guard on
    // the banded path; the r18 deletion-neighborhood path needs no
    // quadratic pool, so the same inputs work and equal brute force
    val rows = (1L to 50L).map(i => i -> s"a$i".take(3))
    val df = rows.toDF("id", "s")
    val out = EditDist.similarPairs(df, col("id"), col("s"),
        maxDist = 1, maxShortPool = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.s"), col("b.s")))
      .filter(col("d") <= 1)
      .select(col("a.id"), col("b.id"), col("d").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == naive && naive.nonEmpty)
  }

  test("the blocked prefix plan (tiny blockSize forces hot-gram split) equals brute force") {
    // one shared hot prefix gram across many ID-like strings: with
    // blockSize = 2 every gram bucket goes through the triangular
    // blocked cells — the 100 TB hot-gram path, value-checked
    val rows = (1L to 40L).map(i => i -> f"item#$i%04d")
    assert(EditDist.similarPairs(rows.toDF("id", "s"), col("id"), col("s"),
        maxDist = 1, q = 3, blockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == brute(rows, 1))
  }

  private def bruteCross(left: Seq[(Long, String)], right: Seq[(Long, String)],
                         k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- left; (ib, sb) <- right
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet

  test("cross-collection join equals brute force (long, short, and mixed pairs)") {
    val left = Seq(1L -> "lavender spring", 2L -> "ab", 3L -> "item#0001",
      4L -> "abcdef")
    val right = Seq(10L -> "lavender sprint", 11L -> "ac", 12L -> "item#0002",
      13L -> "abdef", 14L -> "zzzz", 15L -> "lavender spring")
    for (k <- Seq(1, 2)) {
      val got = EditDist.similarJoin(
          left.toDF("id", "s"), col("id"), col("s"),
          right.toDF("id", "s"), col("id"), col("s"), maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == bruteCross(left, right, k), s"k=$k")
    }
  }

  test("incremental batch-vs-state pairs == full-corpus pairs touching the batch") {
    val old = Seq(1L -> "lavender spring", 2L -> "ab", 3L -> "item#0001",
      4L -> "unrelated words here")
    val batch = Seq(10L -> "lavender sprint", 11L -> "ac", 12L -> "item#0002",
      13L -> "lavender sprigg")
    val all = old ++ batch
    val k = 1
    val state = EditDist.gramState(old.toDF("id", "s"), col("id"), col("s"), k)
    val freq = EditDist.gramFreqState(old.toDF("id", "s"), col("id"), col("s"), k)
    val got = EditDist.incrementalSimilarPairs(
        batch.toDF("id", "s"), col("id"), col("s"), state, freq, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchIds = batch.map(_._1).toSet
    val want = brute(all, k).filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == want)
  }
}
