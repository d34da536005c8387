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
  * Dimension extraction is REAL for PNG/JPEG payloads
  * ([[HeaderDecoder]] parses the container headers — pure JVM, no
  * codec); PIXEL work (feature nets, rescale) is stubbed:
  * [[StubDecoder]] derives deterministic pseudo-features from the raw
  * bytes (documented per field). Production swaps in a codec-backed
  * [[MediaDecoder]] with the same contract; nothing else changes.
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

  /** REAL container-header parse — pure JVM, no codecs: PNG and JPEG
    * dimensions come from the actual bytes; only PIXEL work (features,
    * rescale) remains stubbed. Payloads that are not a recognized image
    * container fall back to [[StubDecoder]]'s deterministic
    * pseudo-features, so the harness's text-as-bytes fixtures keep
    * their SQL-mirrorable stub semantics while real image bytes get
    * real dimensions.
    *
    * Only binary-unambiguous signatures are claimed: PNG starts 0x89
    * and JPEG 0xFF — bytes no ASCII/UTF-8 text can start with — so a
    * text payload can never be misparsed as an image (GIF's "GIF87a"
    * and BMP's "BM" are printable prefixes a text corpus could
    * legitimately begin with; claiming them would make feature rows
    * data-dependent on prose).
    */
  object HeaderDecoder extends MediaDecoder {

    /** (format, width, height) if the payload starts with a recognized
      * image container; None otherwise. */
    def imageHeader(b: Array[Byte]): Option[(String, Int, Int)] =
      pngDims(b).map { case (w, h) => ("png", w, h) }
        .orElse(jpegDims(b).map { case (w, h) => ("jpeg", w, h) })

    private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

    /** PNG: 8-byte signature, then the IHDR chunk (always first, by
      * spec) carries big-endian width/height at offsets 16/20. */
    def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 24) return None
      var i = 0
      while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) Some((w, h)) else None
    }

    /** JPEG: SOI (FFD8), then walk the marker-segment chain to the
      * first frame header (SOF0-SOF15 minus DHT/JPG/DAC), which carries
      * big-endian height/width at segment offsets 5/7. Truncated or
      * misaligned streams return None (fall back to the stub) rather
      * than guessing. */
    def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xFF) return None // misaligned: not a marker
        val m = b(i + 1) & 0xff
        if (m == 0xFF) i += 1 // fill byte padding before a marker
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
        else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before any SOF
        else {
          val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
          if (len < 2) return None
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
            if (i + 9 > b.length || len < 7) return None
            val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
            val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
            return if (w > 0 && h > 0) Some((w, h)) else None
          }
          i += 2 + len
        }
      }
      None
    }

    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = batch.map { r =>
      imageHeader(r.media) match {
        case Some((_, w, h)) =>
          // real dimensions; f0..f3 stay the stub's byte-derived values
          // (pixel decode is the one genuinely codec-bound step)
          StubDecoder.decodeBatch(Seq(r)).head.copy(width = w, height = h)
        case None => StubDecoder.decodeBatch(Seq(r)).head
      }
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
