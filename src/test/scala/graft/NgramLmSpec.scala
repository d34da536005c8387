package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quality scoring: hand-computed model counts, smoothing
  * denominators, surprisal values, unseen-context saturation, and the
  * empty-document drop. */
class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference corpus: "a b" and "a b c"
  // model: (<s>,a)=2, (a,b)=2, (b,c)=1; ctx: <s>=2, a=2, b=1; V=|{a,b,c}|=3
  private lazy val model = NgramLm.bigramModel(
    Seq(1L -> "a b", 2L -> "a b c").toDF("id", "text"), col("id"), col("text"))

  test("bigram model counts BOS transitions and within-doc adjacencies") {
    val m = model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("<s>", "a") -> 2L, ("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("scores are the hand-computed scaled smoothed surprisals") {
    val got = NgramLm.score(
        Seq(10L -> "a b", 11L -> "c q", 12L -> "").toDF("id", "text"),
        col("id"), col("text"), model)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 10: (<s>,a): 1e6*(2+3) div (2+1) = 1666666; (a,b): same -> avg 1666666
    // doc 11: (<s>,c): unseen pair, seen ctx -> 1e6*(2+3) div 1 = 5000000
    //         (c,q): unseen ctx -> ceiling 1e6*(0+3) div 1 = 3000000 -> avg 4000000
    // doc 12: no tokens -> dropped
    assert(got == Map(10L -> ((2L, 1666666L)), 11L -> ((2L, 4000000L))))
  }

  test("in-domain text scores strictly below out-of-domain text") {
    val ref = (1L to 50L).map(i => i -> "the quick brown fox jumps").toDF("id", "text")
    val m = NgramLm.bigramModel(ref, col("id"), col("text"))
    val s = NgramLm.score(
        Seq(100L -> "the quick brown fox", 101L -> "zz yy xx ww").toDF("id", "text"),
        col("id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(100L) < s(101L))
  }
}
