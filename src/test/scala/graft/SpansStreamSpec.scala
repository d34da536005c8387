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

  test("state compaction bounds live generations; compacted digests still probe") {
    val base = Files.createTempDirectory("graft_spanscompact_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = SpansStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/spans", s"$base/state", s"$base/ckpt", n = N, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def stateDirs: Set[Long] =
      graft.streaming.FileQueue.batchDirs(spark, s"$base/state").map(_._1).toSet
    def hasMarker(id: Long): Boolean =
      new java.io.File(s"$base/state/batch_$id/_FULL").exists()

    // five batches; only the LAST repeats batch 0's text, so the state
    // hit at batch 4 proves the digest survived the compaction chain
    val texts = Seq(
      Seq(1L -> "s1 s2 s3 s4 s5 s6", 2L -> "only here once alpha beta"),
      Seq(11L -> "gamma delta epsilon zeta eta"),
      Seq(21L -> "theta iota kappa lambda mu"),
      Seq(31L -> "nu xi omicron pi rho"),
      Seq(41L -> "w0 s1 s2 s3 s4 s5 s6"))
    texts.zipWithIndex.foreach { case (docs, i) =>
      Files.write(java.nio.file.Paths.get(bronze, s"c$i.json"),
        docs.map { case (id, t) => docJson(id, t) }.mkString("\n").getBytes)
      run()
    }
    // batches 0,1 delta; batch 2 compacts (3rd live generation) and
    // batch 3 prunes the dirs below it; batch 3 delta, batch 4 compacts
    assert(stateDirs == Set(2L, 3L, 4L), s"live generations: $stateDirs")
    assert(hasMarker(2L) && hasMarker(4L) && !hasMarker(3L))
    // the read rule (newest _FULL + later deltas) is a distinct digest
    // set carrying the WHOLE stream history
    val live = spark.read.parquet(s"$base/state/batch_4")
    assert(live.count() == live.select("dg").distinct().count())
    // batch 4 finds batch 0's span through two compaction rounds: doc
    // 41 repeats doc 1's six tokens at positions 1..6
    val got = spark.read.parquet(s"$base/spans/batch_4")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((41L, 1L, 6L, 6L)), s"got $got")
  }
}
