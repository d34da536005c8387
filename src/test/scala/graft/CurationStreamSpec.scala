package graft

import graft.streaming.CurationStream
import graft.operators.{NgramLm, QualityClassifier, TextStats}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming text-curation filter chain: arriving documents route
  * through the frozen gate → classifier → reference-LM screens exactly
  * once each (admit + reject partition every batch, with the reason
  * recorded), the screens match their batch operators, and a drifted
  * model/threshold fails loudly. Fixtures are SELF-CHECKING: every
  * planted document's expected verdict is asserted against the batch
  * operators before the stream runs, so a miscrafted fixture fails at
  * its own assert, not as a routing mystery. */
class CurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val N = 3
  private val Dim = 256
  private val Order = 3

  // three disjoint 5-letter vocabularies + two stopwords: 28 of either
  // vocabulary + "the and" passes the gate exactly (30 words, mean
  // word length 4866 permille, 2 stop hits, all-distinct)
  private def vocab(p: String) = (0 until 28).map(i => f"$p$i%02dz")
  private val NormalWords = vocab("no") // reference-domain prose
  private val MarkerWords = vocab("mk") // the planted flagged domain
  private val WeirdWords = vocab("wd")  // clf-negative, LM-unseen
  private def doc(words: Seq[String]): String =
    (Seq("the", "and") ++ words).mkString(" ")

  private def rec(id: Long, text: String): String =
    if (text == null) s"""{"doc_id":$id,"text":null}"""
    else s"""{"doc_id":$id,"text":"$text"}"""

  test("gate/clf/LM routing with reasons; exactly-once partition; frozen screens; drift fails loudly") {
    val base = Files.createTempDirectory("graft_curation_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()

    val admitText = doc(NormalWords)
    val admit2Text = doc(NormalWords.reverse)
    val markText = doc(MarkerWords)
    val weirdText = doc(WeirdWords)
    val gateFailText = "the and" // 2 words — under the 30-word floor

    // self-check the gate fixture
    val gateCheck = TextStats.withGateFlags(
      Seq(admitText, admit2Text, markText, weirdText, gateFailText).toDF("text"),
      col("text")).select("keep").collect().map(_.getBoolean(0)).toSeq
    assert(gateCheck == Seq(true, true, true, true, false), s"gate fixture drifted: $gateCheck")

    // deployed rate model: marker domain positive, normal+weird negative
    graft.GraftFunctions.ensure(spark)
    val labeled = Seq(
      (1L, doc(MarkerWords), 1), (2L, doc(MarkerWords.reverse), 1),
      (3L, admitText, -1), (4L, doc(WeirdWords), -1),
      (5L, admit2Text, -1), (6L, doc(WeirdWords.reverse), -1))
      .toDF("doc_id", "text", "y")
    val weights = QualityClassifier.trainRates(labeled,
      col("doc_id"), col("text"), col("y"), N, Dim)
    // self-check the classifier fixture: marker flags, the rest don't
    val clfCheck = QualityClassifier.score(
        Seq((1L, admitText), (2L, admit2Text), (3L, markText), (4L, weirdText))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), weights, N, Dim)
      .orderBy("id").select("keep").collect().map(_.getInt(0)).toSeq
    assert(clfCheck == Seq(0, 0, 1, 0), s"classifier fixture drifted: $clfCheck")

    // pruned LM on the normal-domain reference (twice, so trigrams
    // survive the >=2 floor); weird vocabulary scores far above
    val ref = Seq((1L, admitText), (2L, admitText), (3L, admit2Text), (4L, admit2Text))
      .toDF("doc_id", "text")
    val lmModel = NgramLm.prunedBackoffModel(ref, col("doc_id"), col("text"),
      Order, Seq(1L, 1L, 2L))
    val sur = NgramLm.scoreBackoffPruned(
        Seq((1L, admitText), (2L, admit2Text), (3L, weirdText)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), lmModel, Order)
      .orderBy("id").select("avg_surprisal").collect().map(_.getLong(0)).toSeq
    assert(sur(0) < sur(2) && sur(1) < sur(2), s"LM fixture drifted: $sur")
    // the frozen production cut sits between the domains
    val maxSurprisal = (sur.take(2).max + sur(2)) / 2

    def run(): Unit = {
      val q = CurationStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/admit", s"$base/reject", s"$base/ckpt",
        weights, N, Dim, lmModel, Order, maxSurprisal)
      assert(q.awaitTermination(120000))
    }
    def rows(dir: String, b: Int): Map[Long, String] =
      spark.read.parquet(s"$base/$dir/batch_$b")
        .collect().map { r =>
          r.getLong(r.fieldIndex("doc_id")) ->
            (if (r.schema.fieldNames.contains("reason"))
              r.getString(r.fieldIndex("reason")) else "admit")
        }.toMap

    // batch 0 freezes the screens: one admit, one per reject reason
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(11, admitText), rec(12, gateFailText), rec(13, markText),
      rec(14, weirdText), rec(15, null)).mkString("\n").getBytes)
    run()
    assert(rows("admit", 0).keySet == Set(11L))
    assert(rows("reject", 0) == Map(
      12L -> "gate_fail", 13L -> "clf_flagged",
      14L -> "lm_above_threshold", 15L -> "unscoreable"))
    // the admit row carries its observability columns
    val a0 = spark.read.parquet(s"$base/admit/batch_0").head()
    assert(!a0.isNullAt(a0.fieldIndex("score")) &&
      a0.getLong(a0.fieldIndex("avg_surprisal")) == sur(0))

    // batch 1: the frozen screens route a second wave identically —
    // admit + reject ids partition the batch exactly (every-input-
    // routes-once, ADVICE r14's invariant for this family)
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(21, admit2Text), rec(22, markText), rec(23, gateFailText))
      .mkString("\n").getBytes)
    run()
    assert(rows("admit", 1).keySet == Set(21L))
    assert(rows("reject", 1) == Map(22L -> "clf_flagged", 23L -> "gate_fail"))
    val routedIds = rows("admit", 1).keySet ++ rows("reject", 1).keySet
    assert(routedIds == Set(21L, 22L, 23L) && rows("admit", 1).keySet
      .intersect(rows("reject", 1).keySet).isEmpty)

    // a drifted threshold and a drifted model both fail loudly with
    // the frozen-vs-probed values (not just any exception)
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(31, admitText)).mkString("\n").getBytes)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val badCut = CurationStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/admit", s"$base/reject", s"$base/ckpt",
      weights, N, Dim, lmModel, Order, maxSurprisal + 1)
    val e1 = intercept[Exception] { badCut.awaitTermination(120000); badCut.processAllAvailable() }
    assert(msgs(e1).exists(m => m.contains("drifted") &&
        m.contains(s"maxSurprisal=${maxSurprisal + 1}")),
      s"unexpected failure: ${msgs(e1)}")
    val drifted = QualityClassifier.trainRates(
      labeled.withColumn("text", concat(col("text"), lit(" extra"))),
      col("doc_id"), col("text"), col("y"), N, Dim)
    val badModel = CurationStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/admit", s"$base/reject", s"$base/ckpt",
      drifted, N, Dim, lmModel, Order, maxSurprisal)
    val e2 = intercept[Exception] { badModel.awaitTermination(120000); badModel.processAllAvailable() }
    assert(msgs(e2).exists(m => m.contains("drifted") && m.contains("clfDigest")),
      s"unexpected failure: ${msgs(e2)}")
  }
}
