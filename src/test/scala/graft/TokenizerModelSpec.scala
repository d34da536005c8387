package graft

import graft.operators.{Bpe, TokenizerModel, Unigram}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The tokenizer-model interchange contract: save → load round-trips
  * both model kinds exactly (rank order restored, not assumed from
  * file order), and a foreign format / newer version / wrong shape
  * fails loudly instead of decoding garbage. */
class TokenizerModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_tokmodel_$tag").toString + "/m"

  test("BPE ranks file round-trips rank-ordered") {
    val rules = Seq(
      Bpe.MergeRule(2, "er", "</w>", 7L),
      Bpe.MergeRule(0, "t", "h", 42L),
      Bpe.MergeRule(1, "Ġ", "t", 19L))
    val dir = tmp("bpe")
    TokenizerModel.saveBpe(spark, rules, dir)
    val loaded = TokenizerModel.loadBpe(spark, dir)
    assert(loaded == rules.sortBy(_.rank))
    // the artifact is self-describing
    val stamp = spark.read.parquet(dir).select("format", "version").distinct().collect()
    assert(stamp.length == 1 && stamp.head.getString(0) == "graft.bpe" &&
      stamp.head.getInt(1) == TokenizerModel.Version)
  }

  test("unigram piece table round-trips (count desc, piece asc)") {
    val model = Seq(
      Unigram.Piece("an", -1.5, 10L),
      Unigram.Piece("th", -0.5, 30L),
      Unigram.Piece("er", -1.5, 10L))
    val dir = tmp("uni")
    TokenizerModel.saveUnigram(spark, model, dir)
    val loaded = TokenizerModel.loadUnigram(spark, dir)
    assert(loaded == model.sortBy(p => (-p.count, p.piece)))
  }

  test("foreign format, newer version, and wrong shape all fail loudly") {
    // a unigram artifact refused by the BPE loader (and vice versa)
    val uniDir = tmp("cross")
    TokenizerModel.saveUnigram(spark, Seq(Unigram.Piece("th", -1.0, 1L)), uniDir)
    val e1 = intercept[IllegalArgumentException] { TokenizerModel.loadBpe(spark, uniDir) }
    assert(e1.getMessage.contains("graft.bpe"))
    val bpeDir = tmp("cross2")
    TokenizerModel.saveBpe(spark, Seq(Bpe.MergeRule(0, "a", "b", 1L)), bpeDir)
    val e2 = intercept[IllegalArgumentException] { TokenizerModel.loadUnigram(spark, bpeDir) }
    assert(e2.getMessage.contains("graft.unigram"))
    // a future-version artifact is refused with the stamp in the message
    val futDir = tmp("future")
    Seq(("graft.bpe", TokenizerModel.Version + 1, 0, "a", "b", 1L))
      .toDF("format", "version", "rank", "lhs", "rhs", "n")
      .write.mode("overwrite").parquet(futDir)
    val e3 = intercept[IllegalArgumentException] { TokenizerModel.loadBpe(spark, futDir) }
    assert(e3.getMessage.contains(s"version ${TokenizerModel.Version + 1}"))
    // an arbitrary parquet without the contract columns is refused
    val junkDir = tmp("junk")
    Seq((1, "x")).toDF("a", "b").write.mode("overwrite").parquet(junkDir)
    val e4 = intercept[IllegalArgumentException] { TokenizerModel.loadBpe(spark, junkDir) }
    assert(e4.getMessage.contains("not a graft.bpe"))
  }

  test("a TRAINED model survives the round trip and encodes identically") {
    graft.GraftFunctions.ensure(spark)
    val corpus = Seq.fill(6)("the thin thermal tether weathered there").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = Bpe.trainBytes(spark, corpus, org.apache.spark.sql.functions.col("text"),
      nMerges = 6)
    val dir = tmp("trained")
    TokenizerModel.saveBpe(spark, rules, dir)
    val loaded = TokenizerModel.loadBpe(spark, dir)
    assert(loaded == rules.sortBy(_.rank))
    import org.apache.spark.sql.functions._
    val direct = corpus.select(
      call_function("bpe_encode_bytes", col("text"), Bpe.mergesLit(rules)).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    val viaFile = corpus.select(
      call_function("bpe_encode_bytes", col("text"), Bpe.mergesLit(loaded)).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(direct == viaFile)
  }
}
