package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality components: token counts, diversity, stopword ratio") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val r = TextStats.withQuality(df, col("text"), Seq("the", "on")).head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Double]("distinct_ratio") == 5.0 / 6) // "the" twice
    assert(r.getAs[Double]("stop_ratio") == 3.0 / 6)     // the, on, the
  }

  test("withQualityInt never yields NULL on degenerate text (zero-token guard)") {
    // empty / whitespace-only docs must score, not divide by zero: a NULL
    // quality_pm here is a Spark/DuckDB desync (integer // 0 RAISES in
    // DuckDB) and would crash q_quality_prune on a real corpus
    val df = Seq((1L, ""), (2L, "   "), (3L, "the cat")).toDF("id", "text")
    val rows = TextStats.withQualityInt(df, col("text"), Seq("the"))
      .select("id", "quality_pm").collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1), s"quality_pm NULL for id ${r.getLong(0)}")
      val pm = r.getLong(1)
      assert(pm >= 0 && pm <= 3000, s"quality_pm out of range: $pm")
    }
  }

  test("gate flags: hand-computed rule inputs and the keep conjunction") {
    import graft.operators.TextStats.GateRules
    val rules = GateRules(minWords = 3, maxWords = 5, minWordLenPm = 3000,
      maxWordLenPm = 5000, stopwords = Seq("a", "the"), minStopHits = 2,
      minDistinctPm = 600)
    val df = Seq(
      (1L, "the cat saw a cat"),   // 5 words, 13 chars → mwl 2600 fails; stops 2; distinct 4/5=800
      (2L, "the lion ate a bird"), // 5 words, 15 chars → mwl 3000 ok; all rules pass
      (3L, "big dog")              // 2 words → word-count and stop rules fail
    ).toDF("doc_id", "text")
    val out = TextStats.withGateFlags(df, col("text"), rules)
      .select("doc_id", "n_words", "mwl_pm", "distinct_pm", "stop_hits",
        "r_nwords", "r_wordlen", "r_stop", "r_distinct", "keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Int]("n_words") == 5 && r1.getAs[Long]("mwl_pm") == 2600)
    assert(r1.getAs[Long]("distinct_pm") == 800 && r1.getAs[Int]("stop_hits") == 2)
    assert(!r1.getAs[Boolean]("r_wordlen") && r1.getAs[Boolean]("r_stop")
      && !r1.getAs[Boolean]("keep"))
    val r2 = out(2L)
    assert(r2.getAs[Long]("mwl_pm") == 3000 && r2.getAs[Boolean]("keep"))
    val r3 = out(3L)
    assert(!r3.getAs[Boolean]("r_nwords") && !r3.getAs[Boolean]("r_stop")
      && !r3.getAs[Boolean]("keep"))
  }

  test("regex sub-tokens split words, numbers, and punctuation marks") {
    val df = Seq((1L, "hello, world 42!")).toDF("id", "text")
    val r = df.select(TextStats.regexTokenCount(col("text")).as("n")).head()
    assert(r.getAs[Int]("n") == 5) // hello , world 42 !
  }

  test("language ID: argmax of profile hits with alphabetical tie-break") {
    val profiles = Map("en" -> Seq("the"), "fr" -> Seq("le"))
    val df = Seq(
      (1L, "the dog"), (2L, "le chien"),
      (3L, "nothing matches here")) // 0-0 tie → 'en' (alphabetical)
      .toDF("id", "text")
    val out = TextStats.withLangId(df, col("text"), profiles)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out == Map(1L -> "en", 2L -> "fr", 3L -> "en"))
  }

  test("approx_percentile stays within the sketch's rank-error bound of the exact quantiles") {
    val sf = "/root/testdata/sf0.001"
    val exact = graft.queries.TextQueries.lenQuantiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.queries.TextQueries.lenQuantilesApprox(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getAs[Number](1).doubleValue, r.getAs[Number](2).doubleValue)).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=1000 → rank error ≤ 1/1000; on these distributions the
    // VALUE error at p50/p90 stays well inside 5%
    approx.foreach { case (lang, (a50, a90)) =>
      val (e50, e90) = exact(lang)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$lang p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$lang p90: approx $a90 vs exact $e90")
    }
  }

  test("fingerprints: md5 is content hash, poly hash is position-sensitive") {
    val df = Seq((1L, "ab"), (2L, "ba")).toDF("id", "text")
    val out = TextStats.withFingerprints(df, col("text"))
      .collect().map(r => r.getAs[Long]("id") -> (r.getAs[String]("fp_md5"), r.getAs[Long]("fp_poly"))).toMap
    // same chars, different order → same char multiset but different hashes
    assert(out(1L)._1 != out(2L)._1)
    assert(out(1L)._2 == 97 * 1 + 98 * 2)
    assert(out(2L)._2 == 98 * 1 + 97 * 2)
  }

  test("repetition: hand-computed permilles; 1-word doc has no bigram") {
    val df = Seq(
      (1L, "a b a b"),   // dup: (4-2)/4 = 500‰; top bigram "a b"×2 of 4 words = 1000‰
      (2L, "a b c"),     // dup 0‰; bigrams "a b","b c" ×1 → 2/3 = 666‰
      (3L, "x"))         // no bigram → 0‰; no dup → 0‰
      .toDF("id", "text")
    val out = TextStats.withRepetition(df, col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("dup_word_permille"), r.getAs[Long]("top_bigram_permille")))).toMap
    assert(out(1L) == ((4L, 500L, 1000L)))
    assert(out(2L) == ((3L, 0L, 666L)))
    assert(out(3L) == ((1L, 0L, 0L)))
  }

  test("chunkSliding: tail chunk covers the end; short docs yield one chunk; starts advance by stride") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6"), (2L, "s1 s2")).toDF("id", "text")
    val out = TextStats.chunkSliding(df, col("id"), col("text"), window = 3, stride = 2)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start"), r.getAs[Long]("chunk_len"), r.getAs[String]("chunk_text")))
      .sortBy(t => (t._1, t._2))
    // doc 1: n=6, last start = ceil((6-3)/2)*2 = 4 → starts 0,2,4
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 0L, 3L, "t1 t2 t3"),
      (1L, 1L, 2L, 3L, "t3 t4 t5"),
      (1L, 2L, 4L, 2L, "t5 t6")))
    // doc 2 fits one window → exactly one (sub-window) chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 2L, "s1 s2")))
    // every token of doc 1 appears in at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap(_._5.split(" ")).toSet
    assert(covered == Set("t1", "t2", "t3", "t4", "t5", "t6"))
    intercept[IllegalArgumentException] {
      TextStats.chunkSliding(df, col("id"), col("text"), window = 2, stride = 3)
    }
  }

  test("vocabDrift: hand-computed smoothed ratios, both-direction magnitude, top-k order") {
    // old: a=3, b=1 (No=4); new: a=1, b=2, c=1 (Nn=4); V=3
    val old = Seq("a", "a", "a", "b").toDF("token")
    val neu = Seq("a", "b", "b", "c").toDF("token")
    val rows = TextStats.vocabDrift(old, neu, col("token"), minSupport = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ratio = 1e6*(n_new+1)*(No+V) div ((n_old+1)*(Nn+V)):
    //   a: 1e6*2*7 div (4*7)  = 500000  -> drift 1e12 div 500000 = 2000000
    //   b: 1e6*3*7 div (2*7)  = 1500000 -> drift 1500000
    //   c: 1e6*2*7 div (1*7)  = 2000000 -> drift 2000000
    // order: drift desc, token asc
    assert(rows.toSeq == Seq(
      ("a", 3L, 1L, 500000L, 2000000L),
      ("c", 0L, 1L, 2000000L, 2000000L),
      ("b", 1L, 2L, 1500000L, 1500000L)))
  }

  test("vocabDrift minSupport prunes rare tokens; topK bounds the report") {
    val old = (Seq.fill(30)("x") ++ Seq("rare")).toDF("token")
    val neu = Seq.fill(10)("x").toDF("token")
    val got = TextStats.vocabDrift(old, neu, col("token"), minSupport = 20, topK = 10)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("x")) // "rare" fails support
  }
}
