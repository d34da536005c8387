package graft

import graft.operators.{LangId, QualityClassifier}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus-trained language-ID classifier: training replay against
  * a local reference (same FNV fold, same exact divisions), decision
  * ACCURACY on separable synthetic corpora (what the oracled
  * q_langid_trained row cannot claim — the harness corpus's labels are
  * text-independent, so its gate verifies arithmetic, not judgment),
  * the argmax tie rule, and the interchange stamp. */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 3
  private val Dim = 512

  // ---- local reference: counts, rates, scores — no Spark ----

  private def refFeatures(text: String): Seq[Long] = {
    val t = text.toLowerCase
    val grams = (0 to t.length - N).map(i =>
      QualityClassifier.fnvBucketLocal(t.substring(i, i + N), Dim))
    grams :+ Dim.toLong // bias
  }

  private def refWeights(labeled: Seq[(String, String)]): Map[(String, Long), Long] = {
    val counts = labeled.flatMap { case (text, lang) =>
      refFeatures(text).map(b => (lang, b))
    }.groupMapReduce(identity)(_ => 1L)(_ + _)
    val tots = counts.groupMapReduce(_._1._1)(_._2)(_ + _)
    counts.map { case ((lang, b), c) =>
      (lang, b) -> (QualityClassifier.RateScale * c) / tots(lang)
    }
  }

  private def refPredict(text: String, w: Map[(String, Long), Long],
                         langs: Seq[String]): String = {
    val scores = langs.sorted.map(l =>
      l -> refFeatures(text).map(b => w.getOrElse((l, b), 0L)).sum)
    // argmax, ties to the alphabetically first language
    scores.reduceLeft((x, y) => if (y._2 > x._2) y else x)._1
  }

  // separable three-language corpus: disjoint character inventories
  private val Langs = Seq("aa", "bb", "cc")
  private def word(rnd: scala.util.Random, chars: String): String =
    Vector.fill(rnd.nextInt(4) + 3)(chars(rnd.nextInt(chars.length))).mkString
  private def doc(rnd: scala.util.Random, chars: String): String =
    Vector.fill(10)(word(rnd, chars)).mkString(" ")
  private val Chars = Map("aa" -> "abcdef", "bb" -> "ghijkl", "cc" -> "mnopqr")

  private def corpus(seed: Int, n: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val l = Langs(i % Langs.size)
      (i.toLong, doc(rnd, Chars(l)), l)
    }
  }

  test("trainRates matches the local reference bucket for bucket") {
    val data = corpus(1, 60)
    val df = data.toDF("id", "text", "lang")
    val got = LangId.trainRates(df, col("id"), col("text"), col("lang"), N, Dim)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == refWeights(data.map(d => (d._2, d._3))))
  }

  test("separable corpus: 100% holdout accuracy (the operator actually classifies)") {
    val train = corpus(2, 90)
    val test = corpus(99, 45) // fresh draws, same inventories
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val scored = LangId.score(test.toDF("id", "text", "lang"),
        col("id"), col("text"), w, Langs, N, Dim)
      .join(test.toDF("id", "text", "lang").select("id", "lang"), Seq("id"))
    val acc = scored.agg(
      sum((col("predicted_lang") === col("lang")).cast("long")),
      count(lit(1))).head()
    assert(acc.getLong(0) == acc.getLong(1),
      s"expected perfect separation, got ${acc.getLong(0)}/${acc.getLong(1)}")
  }

  test("score matches the reference prediction on every holdout document") {
    val train = corpus(3, 60)
    val test = corpus(98, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val refW = refWeights(train.map(d => (d._2, d._3)))
    val got = LangId.score(test.toDF("id", "text", "lang"),
        col("id"), col("text"), w, Langs, N, Dim)
      .select("id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    test.foreach { case (id, text, _) =>
      assert(got(id) == refPredict(text, refW, Langs), s"doc $id")
    }
  }

  test("argmax ties break to the alphabetically first language") {
    // two classes with IDENTICAL training text → identical rate
    // vectors → every score ties → 'aa' must win every prediction
    val train = Seq((1L, "xyz xyz", "bb"), (2L, "xyz xyz", "aa"))
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val pred = LangId.score(Seq((9L, "xyz")).toDF("id", "text"),
        col("id"), col("text"), w, Seq("aa", "bb"), N, Dim)
      .select("predicted_lang").head().getString(0)
    assert(pred == "aa")
  }

  test("null-text documents are unscoreable (no row), others keep one row each") {
    val train = corpus(4, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val docs = Seq((1L, "abc def"), (2L, null.asInstanceOf[String])).toDF("id", "text")
    val rows = LangId.score(docs, col("id"), col("text"), w, Langs, N, Dim)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L))
  }

  test("incremental class counts: merged state equals direct training over the union") {
    val data = corpus(7, 60)
    val old = data.filter(_._1 % 10 < 8)
    val batch = data.filter(_._1 % 10 >= 8)
    val merged = LangId.mergeClassCounts(
        LangId.classCounts(old.toDF("id", "text", "lang"),
          col("id"), col("text"), col("lang"), N, Dim),
        LangId.classCounts(batch.toDF("id", "text", "lang"),
          col("id"), col("text"), col("lang"), N, Dim))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = LangId.classCounts(data.toDF("id", "text", "lang"),
        col("id"), col("text"), col("lang"), N, Dim)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == full, "additivity broke: incremental != full")
  }

  test("interchange round trip; foreign format and drifted geometry refused") {
    val train = corpus(5, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val dir = java.nio.file.Files.createTempDirectory("langid_model").toString
    LangId.saveModel(spark, w, N, Dim, s"$dir/m")
    val loaded = LangId.loadModel(spark, s"$dir/m", N, Dim)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(loaded == w.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
    val eGeom = intercept[IllegalArgumentException](
      LangId.loadModel(spark, s"$dir/m", N, Dim * 2))
    assert(eGeom.getMessage.contains("incomparable"))
    QualityClassifier.saveModel(spark,
      Seq((0L, 1L)).toDF("b", "w"), N, Dim, s"$dir/clf")
    val eFmt = intercept[IllegalArgumentException](
      LangId.loadModel(spark, s"$dir/clf", N, Dim))
    assert(eFmt.getMessage.contains("graft.langid-clf") ||
      eFmt.getMessage.contains("not a"))
  }

  test("coverage guard fails loudly when the model carries classes outside langs") {
    val train = corpus(6, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val e = intercept[IllegalArgumentException](
      LangId.score(Seq((1L, "abc")).toDF("id", "text"),
        col("id"), col("text"), w, Seq("aa", "bb"), N, Dim).collect())
    assert(e.getMessage.contains("cc") && e.getMessage.contains("vanish"))
  }

  test("coverage check is memoized per frozen artifact path (ADVICE r17)") {
    val train = corpus(7, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val dir = java.nio.file.Files.createTempDirectory("langid_memo").toString
    w.write.parquet(s"$dir/m")
    val frozen = spark.read.parquet(s"$dir/m")
    LangId.coverageChecked.clear()
    LangId.score(Seq((1L, "abc")).toDF("id", "text"),
      col("id"), col("text"), frozen, Langs, N, Dim).collect()
    assert(LangId.coverageChecked.size == 1,
      "a pure file-scan model plan must land one memo entry")
    // Observe the skip directly: overwrite the SAME path with a model
    // carrying an uncovered class — the memoized call must NOT re-run
    // the check (frozen artifact dirs are immutable by contract; this
    // test exploits the documented assumption to observe the memo).
    LangId.trainRates(
        (train :+ ((999L, "zz zz zz", "dd"))).toDF("id", "text", "lang"),
        col("id"), col("text"), col("lang"), N, Dim)
      .write.mode("overwrite").parquet(s"$dir/m")
    LangId.score(Seq((2L, "abc")).toDF("id", "text"),
      col("id"), col("text"), spark.read.parquet(s"$dir/m"), Langs, N, Dim)
    // a FRESH path with the uncovered model still fails loudly (no memo hit)
    spark.read.parquet(s"$dir/m").write.parquet(s"$dir/m2")
    val e = intercept[IllegalArgumentException](
      LangId.score(Seq((3L, "abc")).toDF("id", "text"),
        col("id"), col("text"), spark.read.parquet(s"$dir/m2"), Langs, N, Dim))
    assert(e.getMessage.contains("dd"))
    LangId.coverageChecked.clear()
  }

  test("in-memory (non-scan) model plans are never memoized — check runs per call") {
    val train = corpus(8, 30)
    val w = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    LangId.coverageChecked.clear()
    LangId.score(Seq((1L, "abc")).toDF("id", "text"),
      col("id"), col("text"), w, Langs, N, Dim).collect()
    assert(LangId.coverageChecked.isEmpty,
      "a trained (computed) plan has no frozen identity to memoize under")
  }
}
