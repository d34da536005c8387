package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactRows drops full-row duplicates only") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
    assert(Dedup.exactRows(df).count() == 2)
  }

  test("shingles: distinct word 3-grams; short texts yield none") {
    val df = Seq((1L, "a b c d"), (2L, "x y")).toDF("id", "text")
    val sh = Dedup.shingles(df, col("id"), col("text"), 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("identical texts share the full MinHash signature; LSH pairs them; Jaccard = 1.0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words appear in this one here"))
      .toDF("id", "text")
    val sh = Dedup.shingles(df, col("id"), col("text"), 3)
    val cands = Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh, 8), 8, 2))
    val verified = Dedup.jaccardVerify(cands, sh, 0.6).collect()
    assert(verified.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(verified.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical token sets get identical signatures, disjoint sets differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same tokens, different order
      (3L, "zeta eta theta iota kappa lambda"))
      .toDF("id", "text")
    val out = Dedup.simhash(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
    assert(out(1L).length == 16 && out(1L).forall(c => c == '0' || c == '1'))
  }
}
