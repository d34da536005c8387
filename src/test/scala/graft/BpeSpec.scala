package graft

import graft.operators.Bpe
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training + the native `bpe_encode` expression.
  *
  * The iterative argmax loop is NOT SQL-expressible, so its gate is an
  * INDEPENDENT reference implementation (plain Scala string maps, no
  * Spark) run over the same corpus — any divergence in pair counting,
  * tie-breaks, greedy merge application, or the encoder's rank order
  * shows up as a rule-list or token-list mismatch.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- reference implementation (driver-side, no Spark) ----

  private def refSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndOfWord

  private def refPairCounts(vocab: Map[Vector[String], Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupMapReduce(_._1)(_._2)(_ + _)

  private def refMergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toVector
  }

  private def refTrain(corpus: Seq[String], nMerges: Int,
                       minFreq: Long = 2L): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => refSymbols(w) -> f }
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var dry = false
    while (rules.size < nMerges && !dry) {
      val counts = refPairCounts(vocab)
      if (counts.isEmpty) dry = true
      else {
        val ((a, b), n) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (n < minFreq) dry = true
        else {
          rules += ((a, b, n))
          vocab = vocab.toSeq.map { case (s, f) => refMergeOnce(s, a, b) -> f }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    rules.toSeq
  }

  private def refEncodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = refSymbols(word)
    var done = syms.length < 2
    while (!done) {
      val cands = syms.zip(syms.tail).flatMap(p => ranks.get(p))
      if (cands.isEmpty) done = true
      else {
        val best = cands.min
        val (a, b) = ranks.collectFirst { case (p, r) if r == best => p }.get
        syms = refMergeOnce(syms, a, b)
        done = syms.length < 2
      }
    }
    syms
  }

  // ---- a small deterministic corpus with real merge structure ----
  private val Corpus = Seq(
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low new wide lowest newest")

  test("pairCounts matches the reference on the raw vocabulary") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Bpe.pairCounts(Bpe.withSymbols(Bpe.wordFreq(df, col("text"))))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val vocab = Corpus.flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => refSymbols(w) -> f }
    assert(got == refPairCounts(vocab))
  }

  test("mergeOnce is greedy left-to-right, non-overlapping (a == b runs)") {
    val df = Seq(Tuple1(Array("x", "x", "x", "x", "x"))).toDF("syms")
    val out = df.select(Bpe.mergeOnce(col("syms"), "x", "x")).head.getSeq[String](0)
    assert(out == Seq("xx", "xx", "x"))
  }

  test("train matches the reference implementation rule for rule") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = Bpe.train(spark, df, col("text"), nMerges = 12)
      .map(r => (r.lhs, r.rhs, r.n))
    val want = refTrain(Corpus, 12)
    assert(got == want)
    // rule ranks are their positions
    Bpe.train(spark, df, col("text"), nMerges = 3)
      .zipWithIndex.foreach { case (r, i) => assert(r.rank == i) }
  }

  test("driver-drain and distributed paths are rule-for-rule identical") {
    // richer structure than Corpus: 300 random words over a 6-letter
    // alphabet, 80 merges — deep enough that any drift in incremental
    // pair maintenance, lazy-heap invalidation, or tie-breaks surfaces
    val rnd = new scala.util.Random(7)
    val words = Vector.fill(300)(
      Vector.fill(rnd.nextInt(8) + 2)(('a' + rnd.nextInt(6)).toChar).mkString)
    val corpus = Seq.fill(120)(
      Vector.fill(12)(words(rnd.nextInt(words.size))).mkString(" "))
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = Bpe.train(spark, df, col("text"), nMerges = 80)
    val dist = Bpe.train(spark, df, col("text"), nMerges = 80, driverDrainMaxWords = 0)
    assert(local == dist)
    assert(local.map(r => (r.lhs, r.rhs, r.n)) == refTrain(corpus, 80))
  }

  test("drain path matches the reference at production-shaped merge counts") {
    // ~1200 distinct 8-hex-char words over a 16-symbol alphabet: >1000
    // live merges — the scale where the incremental pair maintenance
    // and lazy-heap invalidation do real work (the 80-merge gate above
    // exercises them lightly). The reference recomputes pair counts
    // from scratch every iteration, so agreement is a strong check.
    val rnd = new scala.util.Random(11)
    val words = Vector.fill(1200)(
      Vector.fill(8)("0123456789abcdef" (rnd.nextInt(16))).mkString)
    val corpus = words.grouped(20).map(_.mkString(" ")).toSeq
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // minFreq = 1: the count-2 floor dries this corpus at ~667 rules;
    // at 1 the tail is ALL ties at n=1 — maximal stress on the
    // lexicographic tie order both paths must share
    val got = Bpe.train(spark, df, col("text"), nMerges = 1000, minFreq = 1L)
      .map(r => (r.lhs, r.rhs, r.n))
    assert(got.size == 1000, s"went dry at ${got.size} — corpus too small for the gate")
    assert(got == refTrain(corpus, 1000, minFreq = 1L))
  }

  test("driver-drain path: supplementary chars split and tie-break like Spark") {
    // U+FFFD (3-byte UTF-8, single UTF-16 char) vs U+1D54F (4-byte
    // UTF-8, surrogate PAIR in UTF-16): Java String order puts U+FFFD
    // ABOVE the surrogate; UTF8String byte order puts it BELOW. The two
    // words tie on the second merge, so a trainer comparing UTF-16
    // code units (or splitting toCharArray) diverges from Spark here.
    val x = "𝕏" // 𝕏
    val corpus = Seq("�z �z", s"${x}z ${x}z")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val local = Bpe.train(spark, df, col("text"), nMerges = 3)
    val dist = Bpe.train(spark, df, col("text"), nMerges = 3, driverDrainMaxWords = 0)
    assert(local == dist)
    // first merge: (z, </w>) n=4; second: the UTF-8-smaller U+FFFD side
    assert(local(1).lhs == "�")
  }

  test("train leaves no persisted RDDs behind and stops when dry") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = Seq((1L, "ab ab")).toDF("id", "text")
    // tiny vocab: merges go dry long before 50 — on BOTH paths
    val rules = Bpe.train(spark, df, col("text"), nMerges = 50)
    assert(rules.nonEmpty && rules.size < 50)
    assert(sc.getPersistentRDDs.keySet == before)
    val dist = Bpe.train(spark, df, col("text"), nMerges = 50, driverDrainMaxWords = 0)
    assert(dist == rules)
    assert(sc.getPersistentRDDs.keySet == before)
  }

  test("bpe_encode reproduces the reference encoder; tokens reconstruct the text") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = Bpe.train(spark, df, col("text"), nMerges = 12)
    val ranks = rules.map(r => (r.lhs, r.rhs) -> r.rank).toMap
    val mergesCol = array(rules.map(r =>
      struct(lit(r.lhs).as("lhs"), lit(r.rhs).as("rhs"))): _*)
    val got = df.select(col("id"),
        call_function("bpe_encode", lower(col("text")), mergesCol).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    Corpus.zipWithIndex.foreach { case (text, i) =>
      val want = text.toLowerCase.split(" ", -1).filter(_.nonEmpty)
        .flatMap(w => refEncodeWord(w, ranks)).toSeq
      assert(got(i.toLong) == want, s"doc $i")
      // lossless: stripping the word markers reconstructs the text
      val rebuilt = got(i.toLong).mkString("")
        .split(Bpe.EndOfWord, -1).filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == text.toLowerCase)
    }
  }

  test("model save/load round-trip: loaded rules encode identically") {
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = Bpe.train(spark, df, col("text"), nMerges = 12)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_bpe_model_${java.util.UUID.randomUUID()}"
    try {
      Bpe.saveModel(spark, rules, dir)
      val loaded = Bpe.loadModel(spark, dir)
      assert(loaded == rules)
      val enc = (m: org.apache.spark.sql.Column) => df
        .select(col("id"), call_function("bpe_encode", lower(col("text")), m))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(enc(Bpe.mergesLit(loaded)) == enc(Bpe.mergesLit(rules)))
      // empty model: every word stays per-char + marker (no merges)
      val none = df.select(call_function("bpe_encode", lit("ab"), Bpe.mergesLit(Seq.empty)))
        .head.getSeq[String](0)
      assert(none == Seq("a", "b", Bpe.EndOfWord))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("bpe_encode null contract: null text -> null; corrupt model throws") {
    val merges = array(struct(lit("a").as("lhs"), lit("b").as("rhs")))
    val df = Seq(Tuple1(Option.empty[String]), Tuple1(Some("ab"))).toDF("text")
    val rows = df.select(call_function("bpe_encode", col("text"), merges)).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[String](0) == Seq("ab", Bpe.EndOfWord))
    val bad = array(struct(lit(null).cast("string").as("lhs"), lit("b").as("rhs")))
    val ex = intercept[Exception] {
      Seq(Tuple1("x")).toDF("text")
        .select(call_function("bpe_encode", col("text"), bad)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("whole-stage codegen survives bpe_encode and matches the interpreter") {
    val merges = array(
      struct(lit("a").as("lhs"), lit("b").as("rhs")),
      struct(lit("ab").as("lhs"), lit("c").as("rhs")),
      struct(lit("c").as("lhs"), lit(Bpe.EndOfWord).as("rhs")))
    val df = spark.range(40).select(
      concat(lit("ab c abc x"), (col("id") % 5).cast("string")).as("text"))
    val q = df.select(call_function("bpe_encode", col("text"), merges).as("toks"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [bpe_encode("),
      s"expected bpe_encode inside a codegen stage in:\n$plan")
    // codegen result == per-row interpreted eval through the same rows
    val got = q.collect().map(_.getSeq[String](0))
    val want = df.collect().map { r =>
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val m = ArrayData.toArrayData(Array(
        org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString("a"), UTF8String.fromString("b")),
        org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString("ab"), UTF8String.fromString("c")),
        org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString("c"), UTF8String.fromString(Bpe.EndOfWord))))
      graft.expressions.BpeEncode.encode(UTF8String.fromString(r.getString(0)), m)
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("encoding a training word yields the trained segmentation (stability)") {
    // encode() applied to each vocab word must equal the final symbol
    // state train() left that word in — the defining BPE property
    val df = Corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rules = Bpe.train(spark, df, col("text"), nMerges = 12)
    val ranks = rules.map(r => (r.lhs, r.rhs) -> r.rank).toMap
    // reference: replay training merges in order over the vocab
    var vocab: Map[String, Vector[String]] = Corpus
      .flatMap(_.toLowerCase.split(" ", -1)).filter(_.nonEmpty).distinct
      .map(w => w -> refSymbols(w)).toMap
    rules.foreach(r =>
      vocab = vocab.view.mapValues(s => refMergeOnce(s, r.lhs, r.rhs)).toMap)
    vocab.foreach { case (w, trained) =>
      assert(refEncodeWord(w, ranks) == trained, s"word '$w'")
    }
  }
}
