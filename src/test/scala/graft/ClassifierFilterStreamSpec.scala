package graft

import graft.streaming.ClassifierFilterStream
import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming learned-classifier quality filter: arriving documents are
  * scored against the FROZEN trained weight table and routed
  * pass/drop; the union over batches equals the batch scorer over the
  * union of inputs; unscoreable (null-text) docs drop with a null
  * score; a drifted model or geometry fails loudly. */
class ClassifierFilterStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val N = 3
  private val Dim = 256

  private def rec(id: Long, text: String): String =
    if (text == null) s"""{"doc_id":$id,"text":null}"""
    else s"""{"doc_id":$id,"text":"$text"}"""

  test("pass/drop routing across batches; frozen model; batch parity; drift fails loudly") {
    val base = Files.createTempDirectory("graft_clffilter_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    // balanced separable training set (bias cancels): reference-like
    // prose positive, keyboard-mash negative
    val labeled = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 1),
      (2L, "a good clear sentence with real words here", 1),
      (3L, "zzq zzq vrk vrk jjx jjx wqq wqq", -1),
      (4L, "xkcd qwrt zxvb mnpl qqqq wwww", -1)).toDF("doc_id", "text", "y")
    val weights = QualityClassifier.train(labeled,
      col("doc_id"), col("text"), col("y"), N, Dim, epochs = 3)
    def run(w: org.apache.spark.sql.DataFrame = weights, dim: Int = Dim): Unit = {
      val q = ClassifierFilterStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
        w, n = N, dim = dim)
      assert(q.awaitTermination(120000))
    }
    def ids(dir: String, b: Int): Set[Long] =
      spark.read.parquet(s"$base/$dir/batch_$b")
        .collect().map(_.getLong(0)).toSet

    // batch 0 freezes the filter: prose from the reference vocabulary
    // passes; mash drops; a null text is unscoreable (drop, null score)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(11, "the quick brown fox and the lazy dog here"),
      rec(12, "vrk vrk jjx wqq zzq qqqq"),
      rec(13, null)).mkString("\n").getBytes)
    run()
    assert(ids("pass", 0) == Set(11L))
    assert(ids("drop", 0) == Set(12L, 13L))
    val d0 = spark.read.parquet(s"$base/drop/batch_0")
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("score"))).toMap
    assert(d0(13L) && !d0(12L), "null text must carry a null score; mash a real one")

    // batch 1: second trigger against the frozen model
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(21, "a clear sentence with good real words over here"),
      rec(22, "mnpl zxvb qwrt xkcd wwww")).mkString("\n").getBytes)
    run()
    assert(ids("pass", 1) == Set(21L))
    assert(ids("drop", 1) == Set(22L))

    // parity: union of written scores == the batch scorer over the
    // union of scoreable inputs
    val all = Seq(
      11L -> "the quick brown fox and the lazy dog here",
      12L -> "vrk vrk jjx wqq zzq qqqq",
      21L -> "a clear sentence with good real words over here",
      22L -> "mnpl zxvb qwrt xkcd wwww").toDF("doc_id", "text")
    val offline = QualityClassifier.score(all, col("doc_id"), col("text"), weights, N, Dim)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val written = spark.read.parquet(s"$base/pass/batch_*")
      .unionByName(spark.read.parquet(s"$base/drop/batch_*"))
      .filter(col("score").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("score")))).toSet
    assert(written == offline)

    // drifted geometry and drifted MODEL both fail loudly
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(31, "the dog")).mkString("\n").getBytes)
    val badDim = ClassifierFilterStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      weights, n = N, dim = Dim * 2)
    // specifically the frozen-filter guard, not just any failure (ADVICE r14)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception] { badDim.awaitTermination(120000); badDim.processAllAvailable() }
    assert(msgs(e1).exists(m => m.contains("drifted") && m.contains(s"dim=${Dim * 2}")),
      s"unexpected failure: ${msgs(e1)}")
    val drifted = QualityClassifier.train(
      labeled.withColumn("text", concat(col("text"), lit(" extra"))),
      col("doc_id"), col("text"), col("y"), N, Dim, epochs = 2)
    val badModel = ClassifierFilterStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      drifted, n = N, dim = Dim)
    val e2 = intercept[Exception] { badModel.awaitTermination(120000); badModel.processAllAvailable() }
    assert(msgs(e2).exists(m => m.contains("drifted") && m.contains("modelDigest")),
      s"unexpected failure: ${msgs(e2)}")
  }
}
