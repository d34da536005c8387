package graft

import graft.streaming.{ClfTrainStream, FileQueue}
import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming classifier training: each label batch's counts fold into
  * the persisted ledger and every generation's model equals direct
  * training over the union of batches so far; a planted own-generation
  * replay never double-counts; a drifted geometry fails loudly. */
class ClfTrainStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("y", IntegerType)))

  private val N = 3
  private val Dim = 256

  private def rec(id: Long, text: String, y: Int): String =
    s"""{"doc_id":$id,"text":"$text","y":$y}"""

  private def wOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("per-generation model == direct training over the union; replay guard; drift fails loudly") {
    val base = Files.createTempDirectory("graft_clftrain_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(n: Int = N, dim: Int = Dim): Unit = {
      val q = ClfTrainStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/model", s"$base/ckpt", n = n, dim = dim,
        compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    val b0 = Seq((1L, "the quick brown fox", 1), (2L, "zzq vrk jjx wqq", -1))
    val b1 = Seq((11L, "a good clear sentence here", 1), (12L, "xkcd qwrt zxvb", -1))
    val b2 = Seq((21L, "another fine readable line", 1))

    def direct(rows: Seq[(Long, String, Int)]): Map[Long, Long] =
      wOf(QualityClassifier.trainRates(rows.toDF("doc_id", "text", "y"),
        col("doc_id"), col("text"), col("y"), N, Dim))

    Files.write(java.nio.file.Paths.get(bronze, "f0.json"),
      b0.map((rec _).tupled).mkString("\n").getBytes)
    run()
    assert(wOf(spark.read.parquet(s"$base/model/batch_0")) == direct(b0))

    Files.write(java.nio.file.Paths.get(bronze, "f1.json"),
      b1.map((rec _).tupled).mkString("\n").getBytes)
    run()
    assert(wOf(spark.read.parquet(s"$base/model/batch_1")) == direct(b0 ++ b1))

    // CRASH REPLAY: plant batch 2's own ledger generation with garbage
    // counts — the guard excludes it and the replay overwrites it
    Seq((0L, 99L, 99L)).toDF("b", "n_pos", "n_neg")
      .write.mode("overwrite").parquet(s"$base/state/counts/batch_2")
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"),
      b2.map((rec _).tupled).mkString("\n").getBytes)
    run()
    assert(wOf(spark.read.parquet(s"$base/model/batch_2")) == direct(b0 ++ b1 ++ b2))
    // the 3rd generation folds to _FULL, and the fold equals direct counts
    assert(new java.io.File(s"$base/state/counts/batch_2/_FULL").exists())
    val (live, _) = FileQueue.liveGenerations(spark, s"$base/state/counts", 99L)
    val folded = spark.read.parquet(live: _*)
      .groupBy("b").agg(sum("n_pos").as("n_pos"), sum("n_neg").as("n_neg"))
    val foldedW = wOf(QualityClassifier.weightsFromCounts(folded))
    assert(foldedW == direct(b0 ++ b1 ++ b2))

    // drifted geometry fails loudly
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, "the dog", 1)).mkString("\n").getBytes)
    val bad = ClfTrainStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/model", s"$base/ckpt", n = N, dim = Dim * 2,
      compactEvery = 3)
    val e = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    // specifically the geometry guard, not just any failure (ADVICE r14)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("incomparable")), s"unexpected failure: ${msgs(e)}")
  }
}
