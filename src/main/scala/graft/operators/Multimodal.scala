package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, processed batch-at-a-time.
  *
  * The Spark-side plumbing is real: a declared record shape, partition-
  * parallel batched decoding through `mapPartitions` (each decoder call
  * receives a bounded batch — the JVM analog of `mapInPandas` record
  * batches, letting a native decoder amortize per-call setup), and a
  * typed `Dataset[MediaFeatures]` out.
  *
  * The DECODE itself is stubbed: this container has no image/audio
  * codecs, so [[StubDecoder]] derives deterministic pseudo-features from
  * the raw bytes (documented per field). Production swaps in a codec-
  * backed [[MediaDecoder]] with the same contract; nothing else changes.
  */
object Multimodal {

  /** One input record: id, media kind ("image" | "audio" | "video"),
    * raw payload bytes. */
  final case class MediaRecord(media_id: Long, kind: String, media: Array[Byte])

  /** Extracted features; in production width/height/frames come from
    * the codec, f0..f3 from a real feature net. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      f0: Double, f1: Double, f2: Double, f3: Double)

  trait MediaDecoder extends Serializable {
    /** Decode one bounded batch (vectorized-call contract). */
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for a codec: every field is a pure function
    * of the bytes, so a SQL oracle can mirror it —
    *  - width/height: first/second byte mod 64, 1-based
    *  - n_frames: 1 per started 100 bytes for video, else 1
    *    (the frame-sample stub)
    *  - f0..f3: bytes at positions 0/7/14/21 (mod length), scaled /255.
    */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = batch.map { r =>
      def b(i: Int): Int =
        if (r.media.isEmpty) 0 else r.media(i % r.media.length) & 0xff
      MediaFeatures(
        r.media_id, r.kind, r.media.length.toLong,
        width = 1 + b(0) % 64,
        height = 1 + b(1) % 64,
        n_frames = if (r.kind == "video") 1 + r.media.length / 100 else 1,
        f0 = b(0) / 255.0, f1 = b(7) / 255.0, f2 = b(14) / 255.0, f3 = b(21) / 255.0)
    }
  }

  /** Resize stub: production rescales pixel buffers; the stub rescales
    * the METADATA with the same contract — aspect-preserving fit into a
    * `maxW`×`maxH` box (exact integer arithmetic, floor semantics). */
  def resizeStub(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    if (f.width <= maxW && f.height <= maxH) f
    else {
      // scale = min(maxW/w, maxH/h) without floats: compare cross products
      val byWidth = f.height.toLong * maxW <= f.width.toLong * maxH
      val (w2, h2) =
        if (byWidth) (maxW, math.max(1, (f.height.toLong * maxW / f.width).toInt))
        else (math.max(1, (f.width.toLong * maxH / f.height).toInt), maxH)
      f.copy(width = w2, height = h2)
    }
  }

  /** Frame-sample stub: every `stride`-th frame index of a video
    * (production decodes just those frames; the indices ARE the plan). */
  def sampleFrames(f: MediaFeatures, stride: Int): Seq[Int] = {
    require(stride > 0, s"frame-sample stride must be positive, got $stride")
    (0 until f.n_frames by stride).toSeq
  }

  /** Batched feature extraction: stream each partition in bounded
    * batches through the decoder. `df` must carry (media_id, kind,
    * media). */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder, batchSize: Int = 16): Dataset[MediaFeatures] = {
    val ds = df.selectExpr("media_id", "kind", "media").as(Encoders.product[MediaRecord])
    ds.mapPartitions(it => it.grouped(batchSize).flatMap(decoder.decodeBatch))(
      Encoders.product[MediaFeatures])
  }
}
