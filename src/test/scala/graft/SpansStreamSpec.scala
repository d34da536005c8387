package graft

import graft.streaming.SpansStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ingestion-time streaming substring dedup: batch 2's spans are found
  * against batch 1's PERSISTED digest state without re-reading batch 1,
  * the state stays a distinct digest set across batch dirs, and the
  * crash-replay guard keeps a batch from matching its own digests. */
class SpansStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docJson(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""

  // n = 3 keeps the planted spans short
  private val N = 3

  test("cross-batch spans via digest state; distinct state; replay guard") {
    val base = Files.createTempDirectory("graft_spansstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = SpansStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/spans", s"$base/state", s"$base/ckpt", n = N)
      assert(q.awaitTermination(120000))
    }
    def spans(dir: String): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // batch 1: docs 1/2 share the 4-token span "X Y Z W"; doc 3 unique
    Files.write(java.nio.file.Paths.get(bronze, "b1.json"), Seq(
      docJson(1, "u1 u2 X Y Z W u3"),
      docJson(2, "v1 X Y Z W v2 v3"),
      docJson(3, "one two three four five six")).mkString("\n").getBytes)
    run()
    assert(spans(s"$base/spans/batch_0") ==
      Set((1L, 2L, 5L, 4L), (2L, 1L, 4L, 4L)))

    // batch 2: doc 11 repeats OLD doc 3's "three four five" (state hit),
    // docs 12/13 share a batch-internal span, doc 14 unique. Old docs
    // emit nothing (their report shipped with batch 0).
    Files.write(java.nio.file.Paths.get(bronze, "b2.json"), Seq(
      docJson(11, "w1 three four five w2"),
      docJson(12, "A B C d1"),
      docJson(13, "d2 A B C"),
      docJson(14, "nothing shared here at all")).mkString("\n").getBytes)
    run()
    assert(spans(s"$base/spans/batch_1") ==
      Set((11L, 1L, 3L, 3L), (12L, 0L, 2L, 3L), (13L, 1L, 3L, 3L)))

    // the state is a DISTINCT digest set across batch dirs: batch 1's
    // delta must not re-carry "three four five" (already in state) —
    // i.e. zero duplicate digests in the union
    val st = spark.read.parquet(s"$base/state/*")
    assert(st.count() == st.select("dg").distinct().count())

    // CRASH REPLAY: plant batch 2's own digests under state/batch_2
    // (the crash-between-state-write-and-commit window), then ingest
    // batch 3 with unique text: its spans must be EMPTY — and had the
    // guard failed, batch 2's replay scenario would cover docs fully.
    val pre = {
      import spark.implicits._
      Seq((21L, "fresh unique words for batch three only")).toDF("doc_id", "text")
    }
    import org.apache.spark.sql.functions.col
    graft.operators.Dedup.spanDigestState(pre, col("doc_id"), col("text"), N)
      .write.mode("overwrite").parquet(s"$base/state/batch_2")
    Files.write(java.nio.file.Paths.get(bronze, "b3.json"), Seq(
      docJson(21, "fresh unique words for batch three only")).mkString("\n").getBytes)
    run()
    // the planted dir IS batch 2's: batch index advances to 2 for b3,
    // the guard excludes state/batch_2, so doc 21 matches nothing
    assert(spans(s"$base/spans/batch_2") == Set.empty)
  }
}
