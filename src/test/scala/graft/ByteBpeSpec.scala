package graft

import graft.operators.{Bpe, ByteLevel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level pretokenization + byte-fallback BPE ([[ByteLevel]],
  * `byte_pretok`, `bpe_encode_bytes`, [[Bpe.trainBytes]]).
  *
  * The gate is an INDEPENDENT reference implementation written
  * straight from the published description (Radford et al. 2019
  * §2.2): `bytes_to_unicode` built as the running-counter table, the
  * classic "collect pairs, merge the min-rank pair, repeat" encoder
  * (a different algorithmic spelling than the expression's in-place
  * scan), and a from-scratch trainer. Multibyte and SUPPLEMENTARY
  * characters are the point: byte-level must split them into several
  * byte symbols and still round-trip losslessly — no input maps to
  * unk.
  */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- independent reference implementation (no graft code) ----

  /** bytes_to_unicode exactly as published: printable bytes map to
    * themselves, the rest to 256 + running counter. */
  private val refMap: Map[Int, Char] = {
    val bs = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val printable = bs.map(b => b -> b.toChar)
    var n = 0
    val rest = (0 to 255).filterNot(bs.contains).map { b =>
      val c = (256 + n).toChar; n += 1; b -> c
    }
    (printable ++ rest).toMap
  }

  private def refMapWord(w: String): String =
    w.getBytes("UTF-8").map(b => refMap(b & 0xff)).mkString

  private def refPreTok(text: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(ByteLevel.PreTokPattern).matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += refMapWord(m.group())
    out.result()
  }

  /** Classic pair-set encoder: find all adjacent pairs, merge every
    * occurrence of the lowest-ranked one, repeat until none ranks. */
  private def refEncodeWord(mapped: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = mapped.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      val cands = syms.zip(syms.tail).flatMap(ranks.get)
      if (cands.isEmpty) done = true
      else {
        val best = cands.min
        val (a, b) = ranks.collectFirst { case (p, r) if r == best => p }.get
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
        done = syms.length < 2
      }
    }
    syms
  }

  private def refEncode(text: String, ranks: Map[(String, String), Int]): Seq[String] =
    refPreTok(text).flatMap(refEncodeWord(_, ranks))

  /** From-scratch byte-level trainer (recomputes pair counts fully
    * each round — no incremental maintenance to share bugs with). */
  private def refTrainBytes(corpus: Seq[String], nMerges: Int,
                            minFreq: Long = 2L): Seq[(String, String, Long)] = {
    def utf8Cmp(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      val c = java.util.Arrays.compareUnsigned(a, b)
      c < 0
    }
    var vocab: Map[Vector[String], Long] = corpus.flatMap(refPreTok)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var dry = false
    while (rules.size < nMerges && !dry) {
      val counts = vocab.toSeq.flatMap { case (s, f) => s.zip(s.tail).map(_ -> f) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), n) = counts.toSeq.sortWith { case (((l1, r1), c1), ((l2, r2), c2)) =>
          if (c1 != c2) c1 > c2
          else if (l1 != l2) utf8Cmp(l1, l2)
          else utf8Cmp(r1, r2)
        }.head
        if (n < minFreq) dry = true
        else {
          rules += ((a, b, n))
          vocab = vocab.toSeq.map { case (s, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
              else { out += s(i); i += 1 }
            }
            out.toVector -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    rules.toSeq
  }

  // multibyte is the point: 2-byte (é, ü), 3-byte (中, €, “”), 4-byte
  // supplementary (𝕏, 😀), mixed whitespace, digits, punctuation runs
  private val Texts = Seq(
    "Hello World",
    "café naïve déjà-vu",
    "中文 text mixed 漢字",
    "emoji 😀 and math 𝕏𝕐",
    "tabs\tand\nnewlines  double  spaces",
    "digits 12345 mixed a1b2",
    "punct!!! ... -- (bracketed) 'quoted'",
    "€99.99 — “smart quotes”",
    "",
    "   ",
    "no-space-prefix")

  test("byteToChar is the published bytes_to_unicode table, bijective") {
    (0 to 255).foreach(b => assert(ByteLevel.byteToChar(b) == refMap(b), s"byte $b"))
    assert(ByteLevel.byteToChar(' '.toInt) == 'Ġ')
    assert(ByteLevel.byteToChar('\n'.toInt) == 'Ċ')
    assert(ByteLevel.byteToChar.toSet.size == 256)
    assert(ByteLevel.byteToChar.forall(c => c != ' '))
    (0 to 255).foreach(b =>
      assert(ByteLevel.charToByte(ByteLevel.byteToChar(b)) == b.toByte))
  }

  test("preTokens matches the reference pretokenizer on every planted text") {
    Texts.foreach { t =>
      assert(ByteLevel.preTokens(t) == refPreTok(t), s"text: '$t'")
    }
    // space attaches to the following run; multi-space runs stay whole
    assert(ByteLevel.preTokens("a b") == Seq("a", "Ġb"))
    assert(ByteLevel.preTokens("a  b") == Seq("a", "ĠĠ", "b"))
    assert(ByteLevel.preTokens(" lead") == Seq("Ġlead"))
    assert(ByteLevel.preTokens("x 12 !?") == Seq("x", "Ġ12", "Ġ!?"))
  }

  test("byte_pretok expression mirrors ByteLevel.preTokens, inside codegen") {
    GraftFunctions.ensure(spark)
    // spark.range keeps the project un-collapsed (a local Seq folds to
    // LocalTableScan at optimize time and never exercises codegen)
    val texts = Texts.zipWithIndex.map(_.swap).toMap
    val pick = texts.foldLeft(lit(null).cast("string")) { case (e, (i, t)) =>
      when(col("id") === i, lit(t)).otherwise(e) }
    val df = spark.range(Texts.size).select(col("id"), pick.as("text"))
    val q = df.select(col("id"), call_function("byte_pretok", col("text")).as("p"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Project [id#") && plan.contains("byte_pretok(") &&
      plan.contains("*(1)"),
      s"expected byte_pretok inside a codegen stage in:\n$plan")
    val got = q.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    Texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refPreTok(t), s"text: '$t'")
    }
  }

  test("trainBytes: drain and distributed paths match each other and the reference") {
    val corpus = Seq(
      "the cat sat on the mat",
      "the cats sat on the mats",
      "le café est naïf",
      "中文 中文 text 中文",
      "the the the café café")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = Bpe.trainBytes(spark, df, col("text"), nMerges = 30)
    val dist = Bpe.trainBytes(spark, df, col("text"), nMerges = 30, driverDrainMaxWords = 0)
    assert(local == dist)
    assert(local.map(r => (r.lhs, r.rhs, r.n)) == refTrainBytes(corpus, 30))
    // byte-level rules carry no end-of-word marker anywhere
    assert(local.forall(r => !r.lhs.contains(Bpe.EndOfWord) && !r.rhs.contains(Bpe.EndOfWord)))
    // multibyte structure actually trained: 中 is 3 bytes, repeated —
    // some rule must fuse two of its byte stand-ins
    val zhong = ByteLevel.mapWord("中")
    assert(local.exists(r => (r.lhs + r.rhs).contains(zhong.substring(0, 2))),
      s"no rule fused the first two bytes of 中 (${zhong.toSeq}) in ${local.take(10)}")
  }

  test("bpe_encode_bytes reproduces the reference encoder on trained rules") {
    GraftFunctions.ensure(spark)
    val corpus = Texts.filter(_.nonEmpty) ++ Seq("the the the", "café café")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = Bpe.trainBytes(spark, df, col("text"), nMerges = 40, minFreq = 1L)
    assert(rules.nonEmpty)
    val ranks = rules.map(r => (r.lhs, r.rhs) -> r.rank).toMap
    val got = df.select(col("id"),
        call_function("bpe_encode_bytes", col("text"), Bpe.mergesLit(rules)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == refEncode(t, ranks), s"text: '$t'")
    }
  }

  test("byte fallback is total: any input round-trips losslessly, zero unks") {
    GraftFunctions.ensure(spark)
    val df = Texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // a rule list that never saw these texts — fallback must carry all
    val rules = Seq(Bpe.MergeRule(0, "t", "h", 1L), Bpe.MergeRule(1, "th", "e", 1L),
      Bpe.MergeRule(2, "Ġ", "t", 1L))
    val got = df.select(col("id"),
        call_function("bpe_encode_bytes", col("text"), Bpe.mergesLit(rules)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    Texts.zipWithIndex.foreach { case (t, i) =>
      val toks = got(i.toLong)
      // every token is a concatenation of byte stand-ins — unmap is
      // total and the concatenation reconstructs the original text
      assert(ByteLevel.unmapWord(toks.mkString("")) == t, s"text: '$t'")
    }
    // supplementary char under an empty model: 4 byte symbols, lossless
    val emoji = spark.sql("SELECT 1").select(
      call_function("bpe_encode_bytes", lit("😀"), Bpe.mergesLit(Seq.empty)))
      .head.getSeq[String](0)
    assert(emoji.length == 4)
    assert(ByteLevel.unmapWord(emoji.mkString("")) == "😀")
  }

  test("bpe_encode_bytes sits inside whole-stage codegen; null contract holds") {
    GraftFunctions.ensure(spark)
    val merges = array(struct(lit("a").as("lhs"), lit("b").as("rhs")))
    val df = spark.range(20).select(
      concat(lit("ab plus "), (col("id") % 3).cast("string")).as("text"))
    val q = df.select(call_function("bpe_encode_bytes", col("text"), merges).as("toks"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [bpe_encode_bytes("),
      s"expected bpe_encode_bytes inside a codegen stage in:\n$plan")
    assert(q.head.getSeq[String](0).head == "ab")
    val rows = Seq(Tuple1(Option.empty[String]), Tuple1(Some("ab")))
      .toDF("text")
      .select(call_function("bpe_encode_bytes", col("text"), merges)).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[String](0) == Seq("ab"))
  }

  test("byte-level unigram: trainBytes pieces live on the byte alphabet; encode is total and parity-exact") {
    GraftFunctions.ensure(spark)
    import graft.operators.Unigram
    import graft.expressions.UnigramEncode
    val corpus = Seq("the cat sat", "the cats sat there", "café 中文 café",
      "the the the", "emoji 😀 end")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val model = Unigram.train(spark, df, col("text"),
      vocabSize = 12, emIters = 2, maxPieceLen = 4, seedSize = 64, byteLevel = true)
    // every piece is a string of byte stand-ins (unmapWord is total on it)
    model.foreach(p => ByteLevel.unmapWord(p.piece))
    // multibyte structure trained: some MULTI-char piece carries one
    // of é/中/😀's non-ASCII stand-in bytes (EM is free to split the
    // é pair across pieces — e.g. "afÃ" + "©" — but the byte alphabet
    // must reach the multi-piece vocabulary)
    assert(model.exists(p => p.piece.length > 1 && p.piece.exists(_ >= 128)),
      s"no multi piece carries a non-ASCII stand-in: ${model.map(_.piece)}")
    // drain == distributed, piece for piece
    val dist = Unigram.train(spark, df, col("text"),
      vocabSize = 12, emIters = 2, maxPieceLen = 4, seedSize = 64,
      byteLevel = true, driverDrainMaxWords = 0)
    assert(dist == model)
    // native encode: parity vs the local composition (preTokens +
    // shared Viterbi), and lossless round-trip on EVERY text incl.
    // supplementary chars under the TRAINED model
    val lit = Unigram.piecesLit(model)
    val got = Texts.zipWithIndex.map(_.swap).toMap
    val out = got.keys.toSeq.sorted.map { i =>
      i -> spark.range(1).select(
        call_function("unigram_encode_bytes", org.apache.spark.sql.functions.lit(got(i)), lit))
        .head.getSeq[String](0)
    }
    val weights = new java.util.HashMap[String, java.lang.Double]
    model.foreach(p => weights.put(p.piece, java.lang.Double.valueOf(p.weight)))
    val maxLen = model.map(_.piece.length).max
    out.foreach { case (i, toks) =>
      val want = ByteLevel.preTokens(got(i)).flatMap { m =>
        val segs = UnigramEncode.encodeWord(m, weights, maxLen)
        (0 until segs.size()).map(segs.get)
      }
      assert(toks == want, s"text: '${got(i)}'")
      assert(ByteLevel.unmapWord(toks.mkString("")) == got(i), s"round-trip: '${got(i)}'")
    }
  }

  test("mapWordSql fragments replay the mapping in DuckDB-compatible arithmetic") {
    // the SQL is DuckDB-side, but its CASE arithmetic is engine-free —
    // replay it here in Scala as a third independent spelling
    def sqlMapByte(b: Int): Char =
      (if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)) b
       else if (b <= 32) 256 + b
       else if (b == 173) 323
       else 162 + b).toChar
    (0 to 255).foreach(b => assert(sqlMapByte(b) == ByteLevel.byteToChar(b), s"byte $b"))
    // and the UTF-8 arithmetic: codepoint → bytes, vs the JDK encoder
    def sqlUtf8(cp: Int): Seq[Int] =
      if (cp < 128) Seq(cp)
      else if (cp < 2048) Seq(192 + cp / 64, 128 + cp % 64)
      else if (cp < 65536) Seq(224 + cp / 4096, 128 + (cp / 64) % 64, 128 + cp % 64)
      else Seq(240 + cp / 262144, 128 + (cp / 4096) % 64, 128 + (cp / 64) % 64, 128 + cp % 64)
    Seq(0x41, 0xE9, 0x4E2D, 0x20AC, 0x1F600, 0x1D54F).foreach { cp =>
      val want = new String(Character.toChars(cp)).getBytes("UTF-8").map(_ & 0xff).toSeq
      assert(sqlUtf8(cp) == want, s"cp $cp")
    }
  }
}
