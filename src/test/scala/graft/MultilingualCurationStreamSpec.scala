package graft

import graft.streaming.MultilingualCurationStream
import graft.operators.{LangId, NgramLm}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming multilingual curation: arriving documents route under the
  * frozen lang-ID model, score against their language's frozen bigram
  * LM, and land pass/reject with per-reason routing; the union over
  * batches equals the batch operators over the union of inputs; a
  * drifted artifact fails loudly. */
class MultilingualCurationStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def rec(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""
  private def recNull(id: Long): String = s"""{"doc_id":$id,"text":null}"""

  // separable two-language world: disjoint character inventories
  private val Langs = Seq("aa", "bb")
  private val N = 3
  private val Dim = 256

  test("route + keyed LM cut across 3 triggers; per-reason rejects; parity; drift fails loudly") {
    val base = Files.createTempDirectory("graft_mlcur_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()

    // router training corpus: clearly separable
    val routerTrain = Seq(
      (1L, "abc abd ace adc aec", "aa"), (2L, "bca cab acb bac cba", "aa"),
      (3L, "ghi ghj gik gjk hik", "bb"), (4L, "ijk jik kij jki ikj", "bb"))
      .toDF("doc_id", "text", "lang")
    val weights = LangId.trainRates(routerTrain, col("doc_id"), col("text"),
      col("lang"), N, Dim)

    // per-language reference LMs: aa's domain is "abc abd", bb's "ghi ghj"
    val lmRef = Seq(
      (11L, "aa", "abc abd abc abd abc abd"),
      (12L, "aa", "abc abd ace"),
      (13L, "bb", "ghi ghj ghi ghj ghi ghj"),
      (14L, "bb", "ghi ghj gik"))
      .toDF("doc_id", "k", "text")
    val lm = NgramLm.bigramModelBy(lmRef, col("doc_id"), col("text"), col("k"))

    // the aa cut sits between in-domain (~1.6-2.3M) and OOV (≥3M)
    // surprisals; bb is deliberately ABSENT from the frozen cut table,
    // so a document routed to bb exercises the uncovered_lang reason
    val cutsAaOnly = Seq(("aa", 2500000L)).toDF("k", "max_avg_surprisal")

    def run(w: org.apache.spark.sql.DataFrame = weights,
            m: org.apache.spark.sql.DataFrame = lm,
            c: org.apache.spark.sql.DataFrame = cutsAaOnly): Unit = {
      val q = MultilingualCurationStream.start(spark, bronze, schema,
        s"$base/archive", s"$base/state", s"$base/out", s"$base/rejects",
        s"$base/ckpt", w, Langs, N, Dim, m, c)
      assert(q.awaitTermination(180000))
    }
    def passIds(l: String, b: Int): Set[Long] = {
      val d = new java.io.File(s"$base/out/lang=$l/batch_$b")
      if (!d.exists()) Set.empty
      else spark.read.parquet(d.toString).collect().map(_.getLong(0)).toSet
    }
    def rejects(b: Int): Map[Long, String] =
      spark.read.parquet(s"$base/rejects/batch_$b")
        .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("reason"))).toMap

    // batch 0 freezes everything: an in-domain aa doc (pass), an
    // out-of-domain aa doc (lm_fail), a bb doc (uncovered_lang — the
    // frozen cuts carry aa only), a null-text doc (null_text)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(101, "abc abd abc abd"),
      rec(102, "aec adc aec adc aec adc"),
      rec(103, "ghi ghj ghi ghj"),
      recNull(104)).mkString("\n").getBytes)
    run()
    assert(passIds("aa", 0) == Set(101L), s"got ${passIds("aa", 0)}")
    assert(passIds("bb", 0).isEmpty)
    val r0 = rejects(0)
    assert(r0(102L) == "lm_fail", r0.toString)
    assert(r0(103L) == "uncovered_lang", r0.toString)
    assert(r0(104L) == "null_text", r0.toString)

    // batch 1: second trigger against the frozen artifacts; a
    // single-token aa doc is unscoreable (no bigram)
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(111, "abc abd abc abd abc"),
      rec(112, "")).mkString("\n").getBytes)
    run()
    assert(passIds("aa", 1) == Set(111L))
    // empty text still ROUTES (bias-only features) but has no bigram
    assert(rejects(1) == Map(112L -> "unscoreable"))

    // batch 2: third trigger
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(121, "abc abd ace abc")).mkString("\n").getBytes)
    run()
    assert(passIds("aa", 2) == Set(121L))

    // PARITY: union of written outcomes == the batch operators over
    // the union of routed inputs (router score + keyed LM score +
    // the frozen cut), for every scoreable document
    val all = Seq(101L -> "abc abd abc abd", 102L -> "aec adc aec adc aec adc",
      103L -> "ghi ghj ghi ghj", 111L -> "abc abd abc abd abc", 112L -> "",
      121L -> "abc abd ace abc").toDF("doc_id", "text")
    val routes = LangId.score(all, col("doc_id"), col("text"), weights, Langs, N, Dim)
      .select(col("id").as("doc_id"), col("predicted_lang"))
    val offline = all.join(routes, Seq("doc_id"))
      .join(NgramLm.scoreBy(all.join(routes, Seq("doc_id")), col("doc_id"),
            col("text"), col("predicted_lang"), lm)
          .withColumnRenamed("k", "predicted_lang")
          .withColumnRenamed("id", "doc_id")
          .select(col("doc_id"), col("predicted_lang"),
            col("avg_surprisal").cast("bigint").as("avg_surprisal")),
        Seq("doc_id", "predicted_lang"), "left")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val writtenPass = spark.read.parquet(s"$base/out/lang=aa/batch_*")
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("avg_surprisal"))).toMap
    writtenPass.foreach { case (id, s) =>
      assert(offline(id)._1 == "aa" && offline(id)._2.contains(s) && s <= 2500000L,
        s"doc $id: stream pass disagrees with the batch operators")
    }
    val writtenRej = (0 to 2).flatMap(b => rejects(b).toSeq).toMap
    assert(writtenPass.keySet ++ writtenRej.keySet ==
      Set(101L, 102L, 103L, 104L, 111L, 112L, 121L),
      "every input must land exactly once")
    assert(offline(102L)._2.exists(_ > 2500000L), "lm_fail must match the batch score")
    assert(offline(103L)._1 == "bb", "uncovered_lang doc routed to bb offline too")

    // DRIFT refusal: a restart with widened cuts must fail loudly,
    // naming frozen vs probed digests
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(131, "abc abd")).mkString("\n").getBytes)
    val driftedCuts = Seq(("aa", 2500000L), ("bb", 9000000L))
      .toDF("k", "max_avg_surprisal")
    val bad = MultilingualCurationStream.start(spark, bronze, schema,
      s"$base/archive", s"$base/state", s"$base/out", s"$base/rejects",
      s"$base/ckpt", weights, Langs, N, Dim, lm, driftedCuts)
    val e = intercept[Exception] { bad.awaitTermination(180000); bad.processAllAvailable() }
    assert(e.getMessage != null)
  }
}
