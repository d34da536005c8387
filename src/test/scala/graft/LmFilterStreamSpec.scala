package graft

import graft.streaming.LmFilterStream
import graft.operators.NgramLm
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming LM quality filter: arriving documents are scored against
  * the FROZEN pruned reference artifact and routed pass/drop; the
  * union over batches equals the batch scorer over the union of
  * inputs; unscoreable docs drop with a null score; a drifted model
  * or threshold fails loudly. */
class LmFilterStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def rec(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  test("pass/drop routing across batches; frozen model; batch parity; drift fails loudly") {
    val base = Files.createTempDirectory("graft_lmfilter_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    val ref = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "the quick red fox runs far away from here",
      "a lazy dog sleeps all day long in the sun")
      .zipWithIndex.map { case (t, i) => i.toLong -> t }.toDF("id", "text")
    val floors = Seq(1L, 1L, 2L, 2L, 2L)
    val model = NgramLm.prunedBackoffModel(ref, col("id"), col("text"),
      order = 5, minCounts = floors)
    // bar between in-domain scores (1.1M for the doubled sentence,
    // 19M for a singleton one whose 5-grams were floored out) and the
    // OOV saturation ceiling (2.9G)
    val bar = 100000000L
    def run(m: org.apache.spark.sql.DataFrame = model, b: Long = bar): Unit = {
      val q = LmFilterStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
        m, order = 5, maxAvgSurprisal = b)
      assert(q.awaitTermination(120000))
    }
    def ids(dir: String, b: Int): Set[Long] =
      spark.read.parquet(s"$base/$dir/batch_$b")
        .collect().map(_.getLong(0)).toSet

    // batch 0 freezes the filter: the doubled reference sentence
    // scores low (pass); pure OOV saturates (drop); empty text is
    // unscoreable (drop, null score)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, "the quick brown fox jumps over the lazy dog"),
      rec(2, "zz yy xx ww vv uu"),
      rec(3, "")).mkString("\n").getBytes)
    run()
    assert(ids("pass", 0) == Set(1L))
    assert(ids("drop", 0) == Set(2L, 3L))
    val d0 = spark.read.parquet(s"$base/drop/batch_0")
      .collect().map(r => r.getLong(0) -> r.isNullAt(r.fieldIndex("avg_surprisal"))).toMap
    assert(d0(3L) && !d0(2L), "empty doc must carry a null score; OOV a real one")

    // batch 1: second trigger against the frozen model
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, "the quick red fox runs far away from here"),
      rec(12, "qq rr ss tt")).mkString("\n").getBytes)
    run()
    assert(ids("pass", 1) == Set(11L))
    assert(ids("drop", 1) == Set(12L))

    // parity: union of written scores == the batch scorer over the
    // union of scoreable inputs
    val all = Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "zz yy xx ww vv uu",
      11L -> "the quick red fox runs far away from here",
      12L -> "qq rr ss tt").toDF("doc_id", "text")
    val offline = NgramLm.scoreBackoffPruned(all, col("doc_id"), col("text"), model, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val written = spark.read.parquet(s"$base/pass/batch_*")
      .unionByName(spark.read.parquet(s"$base/drop/batch_*"))
      .filter(col("avg_surprisal").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("avg_surprisal")))).toSet
    assert(written == offline)

    // drifted threshold and drifted MODEL both fail loudly
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, "the dog")).mkString("\n").getBytes)
    val badBar = LmFilterStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      model, order = 5, maxAvgSurprisal = bar + 1)
    val e1 = intercept[Exception] { badBar.awaitTermination(120000); badBar.processAllAvailable() }
    assert(e1.getMessage != null)
    val drifted = NgramLm.prunedBackoffModel(
      ref.withColumn("text", concat(col("text"), lit(" extra"))),
      col("id"), col("text"), order = 5, minCounts = floors)
    val badModel = LmFilterStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      drifted, order = 5, maxAvgSurprisal = bar)
    val e2 = intercept[Exception] { badModel.awaitTermination(120000); badModel.processAllAvailable() }
    assert(e2.getMessage != null)
  }
}
