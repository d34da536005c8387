package graft

import graft.operators.{Bpe, TokenizerModel, WordPiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece training + the native `wordpiece_encode` expression.
  *
  * The likelihood-greedy argmax loop is NOT SQL-expressible (the
  * oracled q_wordpiece_pairs row covers only iteration 0), so its gate
  * is an INDEPENDENT reference implementation — plain Scala maps,
  * BigInt fractions, pair/symbol counts recomputed from scratch every
  * iteration — run over the same corpus: any drift in the incremental
  * count maintenance, the exact rational comparison, tie-breaks, or
  * greedy merge application surfaces as a merge-list mismatch. The
  * encoder's gate is a reference greedy longest-match over the same
  * vocabulary.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- reference implementation (driver-side, no Spark) ----

  private def refPieces(word: String): Vector[String] = {
    val cps = word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))
    cps.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }
  }

  private def refVocab(corpus: Seq[String]): Map[Vector[String], Long] =
    corpus.flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => refPieces(w) -> f }

  private def refPairCounts(vocab: Map[Vector[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refSymCounts(vocab: Map[Vector[String], Long]): Map[String, Long] =
    vocab.toSeq.flatMap { case (syms, f) => syms.map(_ -> f) }
      .groupMapReduce(_._1)(_._2)(_ + _)

  private def refMergeOnce(syms: Vector[String], a: String, b: String,
                           fused: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += fused; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0

  /** From-scratch likelihood-greedy trainer: exact BigInt fraction
    * comparison, ties to the byte-lexicographically smallest pair. */
  private def refTrain(corpus: Seq[String], nMerges: Int,
                       minFreq: Long = 2L): Seq[(String, String, Long, Long, Long)] = {
    var vocab = refVocab(corpus)
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, Long)]
    var dry = false
    while (rules.size < nMerges && !dry) {
      val syms = refSymCounts(vocab)
      val cands = refPairCounts(vocab).filter(_._2 >= minFreq).toSeq
        .map { case ((a, b), n) => (a, b, n, syms(a), syms(b)) }
      if (cands.isEmpty) dry = true
      else {
        val best = cands.reduce { (x, y) =>
          val c = (BigInt(x._3) * BigInt(y._4) * BigInt(y._5))
            .compare(BigInt(y._3) * BigInt(x._4) * BigInt(x._5))
          if (c > 0) x
          else if (c < 0) y
          else if (utf8Lt(x._1, y._1) ||
            (x._1 == y._1 && (utf8Lt(x._2, y._2) || x._2 == y._2))) x
          else y
        }
        rules += best
        val fused = best._1 + best._2.stripPrefix("##")
        vocab = vocab.toSeq
          .map { case (s, f) => refMergeOnce(s, best._1, best._2, fused) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    rules.toSeq
  }

  /** Reference greedy longest-match encoder (BERT semantics). */
  private def refEncode(text: String, vocab: Set[String]): Vector[String] = {
    val maxLen = if (vocab.isEmpty) 1
      else vocab.map(p => p.stripPrefix("##").codePointCount(0, p.stripPrefix("##").length)).max
    text.split(" ", -1).filter(_.nonEmpty).toVector.flatMap { word =>
      val cps = word.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      if (cps.length > 100) Vector("[UNK]")
      else {
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var failed = false
        while (pos < cps.length && !failed) {
          val lens = (1 to math.min(maxLen, cps.length - pos)).reverse
          lens.map { l =>
            val cand = cps.slice(pos, pos + l).mkString
            if (pos == 0) cand else "##" + cand
          }.find(vocab.contains) match {
            case Some(p) =>
              toks += p
              pos += p.stripPrefix("##").codePointCount(0, p.stripPrefix("##").length)
            case None => failed = true
          }
        }
        if (failed) Vector("[UNK]") else toks.toVector
      }
    }
  }

  // ---- a small deterministic corpus with real merge structure ----
  private val Corpus = Seq(
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low new wide lowest newest")

  test("withPieces/symbolCounts/pairCounts match the reference on the raw vocabulary") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val wp = WordPiece.withPieces(Bpe.wordFreq(df, col("text")))
    val gotPieces = wp.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    refVocab(Corpus).keys.foreach { syms =>
      val word = (syms.head +: syms.tail.map(_.stripPrefix("##"))).mkString
      assert(gotPieces(word) == syms, s"pieces of '$word'")
    }
    val gotSyms = WordPiece.symbolCounts(wp).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotSyms == refSymCounts(refVocab(Corpus)))
    val gotPairs = Bpe.pairCounts(wp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotPairs == refPairCounts(refVocab(Corpus)))
  }

  test("train matches the reference merge for merge (score provenance included)") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = WordPiece.train(spark, df, col("text"), nMerges = 12)
      .map(r => (r.lhs, r.rhs, r.n, r.nLhs, r.nRhs))
    assert(got == refTrain(Corpus, 12))
    WordPiece.train(spark, df, col("text"), nMerges = 3)
      .zipWithIndex.foreach { case (r, i) => assert(r.rank == i) }
  }

  test("likelihood order differs from count order (WordPiece is not BPE)") {
    // "ab" appears 12x but a,b are everywhere (low score); "xq" appears
    // 3x with rare sides (high score) — BPE merges (a,b) first,
    // WordPiece must pick (x, ##q)
    val corpus = Seq(
      "ab ab ab ab ab ab ab ab ab ab ab ab",
      "xq xq xq az bz za zb az bz za zb")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val wpFirst = WordPiece.train(spark, df, col("text"), nMerges = 1).head
    val bpeFirst = Bpe.train(spark, df, col("text"), nMerges = 1).head
    assert((wpFirst.lhs, wpFirst.rhs) == ("x", "##q"))
    assert((bpeFirst.lhs, bpeFirst.rhs) != ("x", "q"))
  }

  test("driver-drain and distributed paths are merge-for-merge identical") {
    val rnd = new scala.util.Random(7)
    val words = Vector.fill(300)(
      Vector.fill(rnd.nextInt(8) + 2)(('a' + rnd.nextInt(6)).toChar).mkString)
    val corpus = Seq.fill(120)(
      Vector.fill(12)(words(rnd.nextInt(words.size))).mkString(" "))
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = WordPiece.train(spark, df, col("text"), nMerges = 60)
    val dist = WordPiece.train(spark, df, col("text"), nMerges = 60,
      driverDrainMaxWords = 0)
    assert(local == dist)
    assert(local.map(r => (r.lhs, r.rhs, r.n, r.nLhs, r.nRhs)) == refTrain(corpus, 60))
  }

  test("drain path matches the reference at depth (incremental counts under churn)") {
    // 16-symbol alphabet, minFreq 1: a long tie-heavy tail stresses the
    // exact rational order and the incremental symbol-count updates
    // (the reference recomputes both from scratch per merge)
    val rnd = new scala.util.Random(11)
    val words = Vector.fill(400)(
      Vector.fill(6)("0123456789abcdef" (rnd.nextInt(16))).mkString)
    val corpus = words.grouped(20).map(_.mkString(" ")).toSeq
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = WordPiece.train(spark, df, col("text"), nMerges = 300, minFreq = 1L)
      .map(r => (r.lhs, r.rhs, r.n, r.nLhs, r.nRhs))
    assert(got.size == 300, s"went dry at ${got.size} — corpus too small for the gate")
    assert(got == refTrain(corpus, 300, minFreq = 1L))
  }

  test("plain clone invariance holds iff the count floor scales with the corpus") {
    // every pair count n and both side counts scale by R, so the score
    // n/(l*r) scales by 1/R UNIFORMLY and the argmax order cannot move
    // — PROVIDED the candidate set is the same. minFreq is an ABSOLUTE
    // floor: cloning lifts below-floor rare pairs (which can carry the
    // HIGHEST scores — rare sides) over it, so a fixed floor changes
    // the candidate set and the merge sequence legitimately diverges
    // (unlike BPE, whose count-argmax can never be won from below the
    // floor). Scale-calibrated floor → bit-stable retraining.
    val df1 = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val dfN = (0 until 10).flatMap(r =>
      Corpus.zipWithIndex.map { case (t, i) => ((r * 1000 + i).toLong, t) })
      .toDF("id", "text")
    val m1 = WordPiece.train(spark, df1, col("text"), nMerges = 10, minFreq = 2L)
    val mN = WordPiece.train(spark, dfN, col("text"), nMerges = 10, minFreq = 20L)
    assert(mN.map(r => (r.rank, r.lhs, r.rhs)) == m1.map(r => (r.rank, r.lhs, r.rhs)),
      "the merge sequence moved under a uniform clone with a scaled floor")
    mN.zip(m1).foreach { case (n, one) =>
      assert(n.n == one.n * 10 && n.nLhs == one.nLhs * 10 && n.nRhs == one.nRhs * 10,
        s"counts not exactly 10x at rank ${one.rank}: $one -> $n")
    }
    // the control: the FIXED floor diverges (measured, not argued) —
    // below-floor pairs surfaced by the clone win on score
    val mFixed = WordPiece.train(spark, dfN, col("text"), nMerges = 10, minFreq = 2L)
    assert(mFixed.map(r => (r.lhs, r.rhs)) != m1.map(r => (r.lhs, r.rhs)),
      "expected the fixed-floor control to diverge on this corpus")
  }

  test("fusedOf strips the continuation prefix; rejects a plain rhs") {
    assert(WordPiece.fusedOf("a", "##b") == "ab")
    assert(WordPiece.fusedOf("##a", "##b") == "##ab")
    intercept[IllegalArgumentException](WordPiece.fusedOf("a", "b"))
  }

  test("vocab layout: [UNK], alphabet, fused pieces in rank order, deduped") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val alpha = WordPiece.alphabet(df, col("text"))
    val rules = WordPiece.train(spark, df, col("text"), nMerges = 8)
    val v = WordPiece.vocab(alpha, rules)
    assert(v.head == WordPiece.UnkToken)
    assert(v.slice(1, 1 + alpha.size) == alpha)
    assert(v.drop(1 + alpha.size) ==
      rules.map(r => WordPiece.fusedOf(r.lhs, r.rhs)).distinct
        .filterNot(alpha.contains))
    assert(v.distinct == v)
  }

  test("encode expression matches the reference encoder under a trained vocabulary") {
    graft.GraftFunctions.ensure(spark)
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = WordPiece.train(spark, df, col("text"), nMerges = 10)
    val v = WordPiece.vocab(WordPiece.alphabet(df, col("text")), rules)
    val got = df.orderBy("id").select(
        call_function("wordpiece_encode", lower(col("text")), WordPiece.vocabLit(v)))
      .collect().map(_.getSeq[String](0).toVector)
    val want = Corpus.map(t => refEncode(t.toLowerCase, v.toSet))
    assert(got.toSeq == want)
  }

  test("greedy longest-match: shadowing, [UNK] whole-word failure, over-length rule") {
    graft.GraftFunctions.ensure(spark)
    val v = Seq("[UNK]", "un", "u", "##n", "##wanted", "##want", "##ed", "x")
    val long = "u" * 101
    val df = Seq((1L, "unwanted unwantednn xyz " + long)).toDF("id", "text")
    val got = df.select(
        call_function("wordpiece_encode", col("text"), WordPiece.vocabLit(v)))
      .head.getSeq[String](0)
    // "unwanted": un + ##wanted (longest wins over ##want ##ed)
    // "unwantednn": un, ##wanted, then 'n' has no plain... '##n' twice
    // "xyz": x then '##y' missing -> whole word [UNK]
    // 101-char word: [UNK] without matching
    assert(got == Seq("un", "##wanted", "un", "##wanted", "##n", "##n", "[UNK]", "[UNK]"))
    assert(got == refEncode("unwanted unwantednn xyz " + long, v.toSet))
  }

  test("whole-stage codegen survives the expression and matches the interpreter") {
    graft.GraftFunctions.ensure(spark)
    val v = WordPiece.vocabLit(Seq("[UNK]", "s", "##i", "##g", "##n"))
    val df = spark.range(40).select(concat(lit("sig"), col("id") % 5).as("t"))
    val q = df.select(call_function("wordpiece_encode", col("t"), v).as("toks"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [wordpiece_encode("),
      s"expected wordpiece_encode inside a codegen stage in:\n$plan")
    val got = q.collect().map(_.getSeq[String](0))
    df.collect().map(_.getString(0)).zip(got).foreach { case (t, toks) =>
      assert(toks == refEncode(t, Set("s", "##i", "##g", "##n")), s"text '$t'")
    }
  }

  test("null contract: null text or vocab -> null; null piece inside the model throws") {
    graft.GraftFunctions.ensure(spark)
    val r = spark.sql(
      """SELECT wordpiece_encode(CAST(NULL AS STRING), array('a')),
        |       wordpiece_encode('a', CAST(NULL AS ARRAY<STRING>))""".stripMargin).head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT wordpiece_encode('a', array('a', CAST(NULL AS STRING)))").collect()
    }
    assert(e.getMessage.contains("corrupt model") ||
      Option(e.getCause).exists(_.getMessage.contains("corrupt model")))
  }

  test("interchange round trip preserves the vocabulary; foreign formats refused") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val v = WordPiece.vocab(WordPiece.alphabet(df, col("text")),
      WordPiece.train(spark, df, col("text"), nMerges = 6))
    val dir = java.nio.file.Files.createTempDirectory("wp_model").toString
    TokenizerModel.saveWordPiece(spark, v, s"$dir/m")
    assert(TokenizerModel.loadWordPiece(spark, s"$dir/m") == v)
    // a BPE artifact is not a WordPiece artifact
    TokenizerModel.saveBpe(spark, Seq(Bpe.MergeRule(0, "a", "b", 1L)), s"$dir/bpe")
    val e = intercept[IllegalArgumentException](
      TokenizerModel.loadWordPiece(spark, s"$dir/bpe"))
    assert(e.getMessage.contains("graft.wordpiece"))
  }

  test("supplementary characters piece by code point on both paths") {
    val x = "𝕏" // U+1D54F, a surrogate pair in UTF-16
    val corpus = Seq(s"${x}ab ${x}ab ${x}ab")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = WordPiece.train(spark, df, col("text"), nMerges = 2)
    val dist = WordPiece.train(spark, df, col("text"), nMerges = 2,
      driverDrainMaxWords = 0)
    assert(local == dist)
    assert(local.map(r => (r.lhs, r.rhs, r.n, r.nLhs, r.nRhs)) == refTrain(corpus, 2))
    // the first piece is the WHOLE surrogate pair, never half of it
    assert(local.head.lhs.codePointCount(0, local.head.lhs.length) >= 1)
    graft.GraftFunctions.ensure(spark)
    val v = WordPiece.vocab(WordPiece.alphabet(df, col("text")), local)
    val got = df.limit(1).select(
        call_function("wordpiece_encode", lower(col("text")), WordPiece.vocabLit(v)))
      .head.getSeq[String](0)
    assert(got == refEncode(corpus.head, v.toSet))
  }
}
