package graft

import graft.streaming.VideoStream
import graft.operators.Multimodal
import graft.queries.MediaSynth
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.Base64

/** Streaming video near-dup: REAL base64 MJPEG-AVI payloads stream in,
  * frame hashes persist as the silver store, and truncated/edited
  * variants arriving in LATER batches pair with their originals
  * through the persisted band state — old×old never re-pairs, params
  * freeze at stream start. */
class VideoStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("media_id", LongType), StructField("media", StringType)))

  private def rec(id: Long, bytes: Array[Byte]): String =
    s"""{"media_id":$id,"media":"${Base64.getEncoder.encodeToString(bytes)}"}"""

  test("variants arriving later pair via persisted band state; frozen params") {
    val base = Files.createTempDirectory("graft_videostream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(threshold: Double = 0.5): Unit = {
      val q = VideoStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/frames", s"$base/state", s"$base/pairs", s"$base/ckpt",
        threshold = threshold)
      assert(q.awaitTermination(120000))
    }
    def pairs(b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$base/pairs/batch_$b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val textA = ("the quick brown fox jumps over the lazy dog again and again " * 8)
      .trim.substring(0, 460) // 8 frames
    val textB = ("colorless green ideas sleep furiously beside the river bank " * 8)
      .trim.substring(0, 460)
    val aviA = MediaSynth.aviFor(textA)
    val aviB = MediaSynth.aviFor(textB)
    val vA = Multimodal.HeaderDecoder.aviVideo(aviA).get
    assert(vA.nFrames == 8)

    // batch 0: two distinct videos — no pairs
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, aviA), rec(2, aviB)).mkString("\n").getBytes)
    run()
    assert(pairs(0).isEmpty)

    // batch 1: a TRUNCATED variant of A (first 6 frames, re-wrapped) —
    // pairs with A through the state probe (J = 5/7)
    val truncated = MediaSynth.aviBytes(MediaSynth.FrameW, MediaSynth.FrameH,
      MediaSynth.FrameUs, (0 until 6).map(vA.frameBytes(aviA, _)))
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, truncated)).mkString("\n").getBytes)
    run()
    assert(pairs(1) == Set((1L, 11L)))

    // batch 2: a variant EDITED inside frame 6's chunk — pairs with A
    // (J = 5/9) AND the truncation (frames 0..5 untouched, J = 5/7)
    val edited = textA.substring(0, 6 * MediaSynth.ProbeLen + 4) + "ZZZZZZ" +
      textA.substring(6 * MediaSynth.ProbeLen + 10)
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, MediaSynth.aviFor(edited))).mkString("\n").getBytes)
    run()
    assert(pairs(2) == Set((1L, 21L), (11L, 21L)))

    // frame store is the per-frame silver artifact
    val frames = spark.read.parquet(s"$base/frames/batch_0")
    assert(frames.filter(col("media_id") === 1L).count() == 8)

    // drifted threshold fails loudly
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, aviB)).mkString("\n").getBytes)
    val bad = VideoStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/frames", s"$base/state", s"$base/pairs", s"$base/ckpt",
      threshold = 0.7)
    val err = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    // specifically the frozen-params guard, not just any failure
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(m => m.contains("rebuild the index") && m.contains("threshold=0.7")),
      s"unexpected failure: ${msgs(err)}")
  }

  test("unparsable container routes to rejects — never a poison pill") {
    val base = Files.createTempDirectory("graft_videoreject_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = VideoStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/frames", s"$base/state", s"$base/pairs", s"$base/ckpt")
      assert(q.awaitTermination(120000))
    }
    val textA = ("the quick brown fox jumps over the lazy dog again and again " * 8)
      .trim.substring(0, 460)
    val aviA = MediaSynth.aviFor(textA)
    val garbage = Array.tabulate[Byte](128)(i => (i * 13 + 5).toByte)
    // a container that PARSES but carries zero frames is the same
    // silent-vanish class as the unparsable one: it yields no shingles
    // and no store rows, so it must route to rejects too (ADVICE r14)
    val zeroFrames = MediaSynth.aviBytes(MediaSynth.FrameW, MediaSynth.FrameH,
      MediaSynth.FrameUs, Seq.empty)
    assert(Multimodal.videoFrameHashes(zeroFrames).exists(_.isEmpty))
    // batch 0: one real video plus one garbage payload and one
    // zero-frame container — the batch commits (frames persisted),
    // both degenerate records are routed
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, aviA), rec(2, garbage), rec(3, zeroFrames)).mkString("\n").getBytes)
    run()
    val rejected = spark.read.parquet(s"$base/state/rejects/batch_0")
      .collect().map(_.getLong(0)).toSet
    assert(rejected == Set(2L, 3L))
    val frames = spark.read.parquet(s"$base/frames/batch_0")
    assert(frames.filter(col("media_id") === 1L).count() == 8)
    assert(frames.filter(col("media_id") === 2L).isEmpty)
    assert(frames.filter(col("media_id") === 3L).isEmpty)
    // the stream is NOT wedged: a truncated variant arriving next still
    // pairs with the original through the persisted band state
    val vA = Multimodal.HeaderDecoder.aviVideo(aviA).get
    val truncated = MediaSynth.aviBytes(MediaSynth.FrameW, MediaSynth.FrameH,
      MediaSynth.FrameUs, (0 until 6).map(vA.frameBytes(aviA, _)))
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, truncated)).mkString("\n").getBytes)
    run()
    val p1 = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((1L, 11L)))
  }
}
