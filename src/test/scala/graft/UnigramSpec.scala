package graft

import graft.expressions.UnigramEncode
import graft.operators.Unigram
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer: the Viterbi decoder equals an independent
  * exhaustive enumerator under the documented tie order, training is
  * deterministic and hand-checkable on a planted corpus, the drain and
  * distributed EM paths produce identical models, and the native
  * expression matches the local scorer end-to-end. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jmap(m: Map[String, Double]): java.util.HashMap[String, java.lang.Double] = {
    val j = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => j.put(k, java.lang.Double.valueOf(v)) }
    j
  }

  private def viterbi(word: String, m: Map[String, Double], maxLen: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    UnigramEncode.encodeWord(word, jmap(m), maxLen).asScala.toSeq
  }

  /** INDEPENDENT reference: enumerate every segmentation (2^(n-1) of
    * them), score with the same weights/unk rule, pick the best under
    * the documented global order — higher weight, fewer pieces, then
    * longer pieces comparing from the word's END. */
  private def exhaustive(word: String, m: Map[String, Double], maxLen: Int): Seq[String] = {
    def segs(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val h = s.substring(0, l)
        val ok = m.contains(h) || l == 1
        if (ok) segs(s.substring(l)).map(h +: _) else Seq.empty
      }
    def weight(seg: Seq[String]): Double =
      seg.map(p => m.getOrElse(p, UnigramEncode.UnkWeight)).sum
    segs(word).maxBy(seg => (weight(seg), -seg.length,
      // longer-from-the-end preference, encoded as an ordered key: the
      // LAST piece's length is the most significant base-64 digit
      seg.reverse.map(_.length).foldLeft(BigInt(0))((acc, l) => acc * 64 + l)
    ))(Ordering.Tuple3(Ordering.Double.TotalOrdering, Ordering.Int, Ordering.BigInt))
  }

  test("Viterbi == exhaustive enumeration on every word over a small alphabet") {
    val m = Map("ab" -> -1.0, "ba" -> -1.0, "aba" -> -1.5, "bb" -> -2.0,
      "a" -> -2.5, "b" -> -3.0, "abab" -> -2.5)
    val alphabet = "ab"
    // every word of length 1..7 over {a,b}: 2+4+...+128 = 254 words —
    // full coverage of the DP's choice space at maxLen 4, ties included
    for (n <- 1 to 7; idx <- 0 until (1 << n)) {
      val word = (0 until n).map(i => alphabet((idx >> i) & 1)).mkString
      assert(viterbi(word, m, 4) == exhaustive(word, m, 4), s"word=$word")
    }
    // unk fallback: chars outside the model become single pieces
    assert(viterbi("abxab", m, 4) == Seq("ab", "x", "ab"))
  }

  test("training on a planted corpus: counts, weights, and prune order are exact") {
    // "ababab" x3 + "cd" x2: the dominant substring is ab
    val df = Seq.fill(3)("ababab cd").toDF("text")
      .union(Seq("cd").toDF("text"))
    val model = Unigram.train(spark, df, col("text"),
      vocabSize = 5, emIters = 2, maxPieceLen = 3, seedSize = 8)
    val byPiece = model.map(p => p.piece -> p).toMap
    // the E-step segments "ababab" as aba|bab — TWO seed pieces at
    // ln(6/57) each beat three "ab"s at ln(9/57) each (the unigram
    // objective rewards longer pieces, exactly where it differs from
    // BPE's greedy pair merging) — and "cd" as cd; the unused seeds
    // (ab/ba) vanish after one round
    // the multi pieces absorb every occurrence, so every single drops
    // at count 0 (coverage rides the encoder's unk fallback)
    assert(model.map(_.piece).toSet == Set("aba", "bab", "cd"))
    assert(byPiece("aba").count == 3L && byPiece("bab").count == 3L &&
      byPiece("cd").count == 4L)
    val total = model.map(_.count).sum
    assert(total == 10L)
    assert(byPiece("cd").weight ==
      StrictMath.log(4.0) - StrictMath.log(total.toDouble))
  }

  test("soft EM: forward-backward posteriors == exhaustive segmentation enumeration") {
    val m = Map("ab" -> -1.0, "ba" -> -1.1, "aba" -> -1.4, "a" -> -2.0, "b" -> -2.3)
    // independent reference: enumerate every segmentation, weight each
    // by its probability, sum per-piece occurrence posteriors
    def exhaustive(word: String, maxLen: Int): Map[String, Double] = {
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(maxLen, s.length)).flatMap { l =>
          val h = s.substring(0, l)
          if (m.contains(h) || l == 1) segs(s.substring(l)).map(h +: _) else Seq.empty
        }
      def p(seg: Seq[String]): Double = StrictMath.exp(
        seg.map(x => m.getOrElse(x, graft.expressions.UnigramEncode.UnkWeight)).sum)
      val all = segs(word)
      val z = all.map(p).sum
      all.flatMap(seg => seg.map(_ -> p(seg) / z))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val lw = jmap(m)
    for (n <- 1 to 7; idx <- 0 until (1 << n)) {
      val word = (0 until n).map(i => "ab" ((idx >> i) & 1)).mkString
      val got = Unigram.expectedCounts(word, lw, 4)
      val want = exhaustive(word, 4)
      assert(got.keySet == want.keySet, s"word=$word: ${got.keySet} vs ${want.keySet}")
      want.foreach { case (piece, e) =>
        assert(math.abs(got(piece) - e) <= 1e-9 * math.max(1.0, e),
          s"word=$word piece=$piece: ${got(piece)} != $e") }
    }
    // a word with an unknown char still normalizes (the unk floor
    // rides the same log-sum-exp, never an underflowed zero)
    val unk = Unigram.expectedCounts("axb", lw, 4)
    assert(math.abs(unk("x") - 1.0) < 1e-12 && unk.values.forall(_ > 0))
  }

  test("soft EM training: dominant pieces agree with hard EM on the planted corpus") {
    val df = Seq.fill(3)("ababab cd").toDF("text").union(Seq("cd").toDF("text"))
    val soft = Unigram.train(spark, df, col("text"),
      vocabSize = 5, emIters = 2, maxPieceLen = 3, seedSize = 8, soft = true)
    // posteriors spread mass over alternatives, but the dominant
    // structure matches the hard path: aba/bab/cd carry the bulk
    val byPiece = soft.map(p => p.piece -> p).toMap
    assert(Set("aba", "bab", "cd").subsetOf(byPiece.keySet))
    assert(byPiece("cd").count >= 3L, s"cd expected count ${byPiece("cd").count}")
    val multiMass = soft.filter(_.piece.length > 1).map(_.count).sum.toDouble
    val singleMass = soft.filter(_.piece.length == 1).map(_.count).sum.toDouble
    assert(multiMass > singleMass,
      s"multi-piece mass $multiMass should dominate singles $singleMass")
    // soft EM above the drain gate fails loudly instead of silently
    // falling back to the hard distributed path
    val e = intercept[IllegalArgumentException] {
      Unigram.train(spark, df, col("text"), vocabSize = 5, emIters = 1,
        maxPieceLen = 3, seedSize = 8, driverDrainMaxWords = 0, soft = true)
    }
    assert(e.getMessage.contains("soft EM requires the driver-drain path"))
  }

  test("likelihood-loss prune keeps the irreplaceable piece and beats rank prune on corpus likelihood") {
    // "uvw" x30 seeds THREE interchangeable pieces (uv / vw / uvw, all
    // count 30) while "pq" x20 seeds one IRREPLACEABLE piece (pq,
    // count 20 — without it the word falls to two low-mass singles).
    // Count-rank prune at vocabSize 2 keeps two of the count-30 pieces
    // and drops pq; the likelihood-loss prune (Kudo's criterion) spends
    // the second slot on pq because removing a redundant piece costs
    // almost nothing while removing pq costs 20·log(1 + p(pq)/(p(p)p(q))).
    val df = (Seq.fill(30)("uvw") ++ Seq.fill(20)("pq")).toDF("text")
    val vocab = Seq("uvw" -> 30L, "pq" -> 20L)
    def corpusLik(model: Seq[Unigram.Piece]): Double = {
      val lw = new java.util.HashMap[String, java.lang.Double]
      model.foreach(p => lw.put(p.piece, java.lang.Double.valueOf(p.weight)))
      vocab.map { case (w, f) => f * Unigram.logZ(w, lw, 4) }.sum
    }
    def multis(m: Seq[Unigram.Piece]) = m.map(_.piece).filter(_.length > 1).toSet
    val rank = Unigram.train(spark, df, col("text"),
      vocabSize = 2, emIters = 2, maxPieceLen = 4, seedSize = 64, soft = true)
    val loss = Unigram.train(spark, df, col("text"),
      vocabSize = 2, emIters = 2, maxPieceLen = 4, seedSize = 64,
      soft = true, lossPrune = true)
    assert(!multis(rank).contains("pq"),
      s"rank prune unexpectedly kept pq: ${multis(rank)}")
    assert(multis(loss).contains("pq") && multis(loss).contains("uvw"),
      s"loss prune should keep the irreplaceable pq and the span piece uvw: ${multis(loss)}")
    assert(corpusLik(loss) > corpusLik(rank),
      s"loss-pruned lik ${corpusLik(loss)} should beat rank-pruned ${corpusLik(rank)}")
    // the criterion is soft-EM-only (it needs the marginal Z)
    val e = intercept[IllegalArgumentException] {
      Unigram.train(spark, df, col("text"), vocabSize = 2, lossPrune = true)
    }
    assert(e.getMessage.contains("lossPrune"))
  }

  test("drain-path model == distributed-fallback model, piece for piece") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(60)
    val drained = Unigram.train(spark, docs, col("text"),
      vocabSize = 30, emIters = 2, maxPieceLen = 4, seedSize = 100)
    val dist = Unigram.train(spark, docs, col("text"),
      vocabSize = 30, emIters = 2, maxPieceLen = 4, seedSize = 100,
      driverDrainMaxWords = 0)
    assert(drained == dist)
    assert(drained.nonEmpty && drained.exists(_.piece.length > 1))
  }

  test("native unigram_encode == the local scorer end-to-end; null and corrupt-model contracts") {
    graft.GraftFunctions.ensure(spark)
    val model = Seq(Unigram.Piece("th", -1.0, 0), Unigram.Piece("er", -1.2, 0),
      Unigram.Piece("e", -2.0, 0), Unigram.Piece("t", -2.1, 0))
    val texts = Seq("the other ether", "", "x", "tee thth")
    val out = texts.toDF("t")
      .select(call_function("unigram_encode", col("t"), Unigram.piecesLit(model)).as("toks"))
      .collect().map(_.getSeq[String](0).toList)
    val weights = model.map(p => p.piece -> p.weight).toMap
    val expected = texts.map(_.split(" ", -1).toSeq.filter(_.nonEmpty)
      .flatMap(w => viterbi(w, weights, 2)).toList)
    assert(out.toSeq == expected)
    // null text -> null out
    val n = Seq((Option.empty[String])).toDF("t")
      .select(call_function("unigram_encode", col("t"), Unigram.piecesLit(model)))
      .collect()
    assert(n.head.isNullAt(0))
    // empty piece is model corruption
    val bad = intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("unigram_encode", col("t"),
          Unigram.piecesLit(Seq(Unigram.Piece("", -1.0, 0)))))
        .collect()
    }
    assert(bad.getMessage != null)
  }
}
