package graft

import graft.operators.LangId
import graft.streaming.LangIdRouteStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming language routing: arriving documents land in their
  * predicted language's partition under the FROZEN corpus-trained
  * model; the union over batches equals the batch scorer over the
  * union of inputs; null-text docs route to rejects with a reason; a
  * drifted model, geometry, or language set fails loudly. */
class LangIdRouteStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val N = 3
  private val Dim = 512
  private val Langs = Seq("aa", "bb", "cc")

  private def rec(id: Long, text: String): String =
    if (text == null) s"""{"doc_id":$id,"text":null}"""
    else s"""{"doc_id":$id,"text":"$text"}"""

  // disjoint character inventories per language (the LangIdSpec corpus)
  private def doc(rnd: scala.util.Random, chars: String): String =
    Vector.fill(8)(Vector.fill(rnd.nextInt(4) + 3)(
      chars(rnd.nextInt(chars.length))).mkString).mkString(" ")
  private val Chars = Map("aa" -> "abcdef", "bb" -> "ghijkl", "cc" -> "mnopqr")

  test("per-language routing across batches; frozen router; batch parity; drift fails loudly") {
    val base = Files.createTempDirectory("graft_langroute_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    val rnd = new scala.util.Random(5)
    val train = (0 until 45).map { i =>
      val l = Langs(i % Langs.size)
      (i.toLong, doc(rnd, Chars(l)), l)
    }
    val weights = LangId.trainRates(train.toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    def run(w: org.apache.spark.sql.DataFrame = weights,
            langs: Seq[String] = Langs, dim: Int = Dim): Unit = {
      val q = LangIdRouteStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/out", s"$base/rejects", s"$base/ckpt",
        w, langs, n = N, dim = dim)
      assert(q.awaitTermination(120000))
    }
    def ids(lang: String, b: Int): Set[Long] = {
      val d = new java.io.File(s"$base/out/lang=$lang/batch_$b")
      if (!d.exists()) Set.empty
      else spark.read.parquet(d.toString).collect().map(_.getLong(0)).toSet
    }

    // fresh draws from each inventory; a null text routes to rejects
    val aDoc = doc(new scala.util.Random(91), Chars("aa"))
    val bDoc = doc(new scala.util.Random(92), Chars("bb"))
    val cDoc = doc(new scala.util.Random(93), Chars("cc"))
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(11, aDoc), rec(12, bDoc), rec(13, null)).mkString("\n").getBytes)
    run()
    assert(ids("aa", 0) == Set(11L) && ids("bb", 0) == Set(12L) && ids("cc", 0).isEmpty)
    val r0 = spark.read.parquet(s"$base/rejects/batch_0")
      .select("doc_id", "reason").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r0 == Set((13L, "null_text")))

    // batch 1 against the frozen router
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(21, cDoc), rec(22, aDoc)).mkString("\n").getBytes)
    run()
    assert(ids("cc", 1) == Set(21L) && ids("aa", 1) == Set(22L))

    // parity: union of routed predictions == the batch scorer over the
    // union of scoreable inputs
    val all = Seq(11L -> aDoc, 12L -> bDoc, 21L -> cDoc, 22L -> aDoc)
      .toDF("doc_id", "text")
    val want = LangId.score(all, col("doc_id"), col("text"), weights, Langs, N, Dim)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("predicted_lang"))).toMap
    val got = Langs.flatMap(l => (0 to 1).flatMap(b => ids(l, b).map(_ -> l))).toMap
    assert(got == want, s"routed=$got scored=$want")
    // ...and every routed row carries its per-class scores for auditing
    val cols = spark.read.parquet(s"$base/out/lang=aa/batch_0").columns.toSet
    assert(Langs.map(l => s"score_$l").toSet.subsetOf(cols), s"missing score columns: $cols")

    // drift fails loudly: a re-trained model, a different geometry, and
    // a different language set each refuse to route
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(31, aDoc)).mkString("\n").getBytes)
    val drifted = LangId.trainRates(
      train.take(30).toDF("id", "text", "lang"),
      col("id"), col("text"), col("lang"), N, Dim)
    val e1 = intercept[Exception] { run(w = drifted) }
    assert(msgs(e1).exists(_.contains("drifted")), s"unexpected: ${msgs(e1)}")
    val e2 = intercept[Exception] { run(langs = Seq("aa", "bb")) }
    assert(msgs(e2).exists(_.contains("drifted")), s"unexpected: ${msgs(e2)}")
  }
}
