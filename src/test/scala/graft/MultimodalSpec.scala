package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRecord}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decoder receives bounded batches (vectorized-call contract)") {
    MultimodalSpec.batchSizes.clear()
    // single partition: 10 records, batch 4 → batches of 4, 4, 2
    Multimodal.extractFeatures(media(10).coalesce(1), new RecordingDecoder, batchSize = 4).collect()
    assert(MultimodalSpec.batchSizes.toArray.map(_.asInstanceOf[Int]).sorted.toSeq == Seq(2, 4, 4))
  }

  private def media(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 3 == 2) "video" else "image",
      s"payload-bytes-for-media-item-number-$i".getBytes("UTF-8")))
      .toDF("media_id", "kind", "media")

  test("all records decoded exactly once across partitions") {
    val out = Multimodal.extractFeatures(media(50).repartition(4), Multimodal.StubDecoder, 8)
      .collect()
    assert(out.map(_.media_id).sorted.toSeq == (0L until 50L))
  }

  test("stub features are deterministic functions of the bytes") {
    val out = Multimodal.extractFeatures(media(3), Multimodal.StubDecoder, 16)
      .collect().map(f => f.media_id -> f).toMap
    val bytes0 = "payload-bytes-for-media-item-number-0".getBytes("UTF-8")
    assert(out(0L).n_bytes == bytes0.length)
    assert(out(0L).width == 1 + (bytes0(0) & 0xff) % 64)
    assert(out(0L).f1 == (bytes0(7) & 0xff) / 255.0)
    assert(out(2L).kind == "video" && out(2L).n_frames == 1 + bytes0.length / 100)
    assert(out(0L).n_frames == 1)
  }

  test("resize stub: aspect-preserving fit, no-op when already inside the box") {
    val f = Multimodal.MediaFeatures(1L, "image", 10L, 64, 32, 1, 0, 0, 0, 0)
    val r = Multimodal.resizeStub(f, 16, 16)
    assert(r.width == 16 && r.height == 8) // 2:1 aspect kept
    assert(Multimodal.resizeStub(f, 100, 100) eq f)
    val tall = Multimodal.MediaFeatures(2L, "image", 10L, 10, 60, 1, 0, 0, 0, 0)
    val r2 = Multimodal.resizeStub(tall, 16, 12)
    assert(r2.height == 12 && r2.width == 2)
  }

  test("frame-sample stub: every nth index, bounded by frame count") {
    val v = Multimodal.MediaFeatures(3L, "video", 10L, 1, 1, 10, 0, 0, 0, 0)
    assert(Multimodal.sampleFrames(v, 3) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrames(v.copy(n_frames = 1), 5) == Seq(0))
  }
}

object MultimodalSpec {
  /** JVM-static so task-serialized decoder copies still hit it (local
    * mode = one JVM); a driver-held field would only see the original. */
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** Wraps the stub and records every batch size the decoder sees. */
class RecordingDecoder extends Multimodal.MediaDecoder {
  def decodeBatch(batch: Seq[Multimodal.MediaRecord]): Seq[Multimodal.MediaFeatures] = {
    MultimodalSpec.batchSizes.add(batch.size)
    Multimodal.StubDecoder.decodeBatch(batch)
  }
}
