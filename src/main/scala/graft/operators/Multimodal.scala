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
  * Decode depth is tiered, all pure JVM:
  *  - [[HeaderDecoder]] — REAL container parses (PNG/JPEG dimensions,
  *    WAV/RIFF rate + duration, AVI dimensions + frame index + timing),
  *    no pixel work; what the oracled queries run.
  *  - [[PixelDecoder]] — REAL pixel decode via `javax.imageio` for
  *    images (content mean-RGB/intensity features) AND for
  *    MJPEG-in-AVI video (per-frame JPEGs through the same path,
  *    features averaged over a bounded frame sample), on top of the
  *    header tier; [[PixelOps.resize]] does real aspect-fit pixel
  *    rescale.
  *  - [[StubDecoder]] — deterministic byte-derived pseudo-features
  *    (documented per field), the SQL-mirrorable fallback for payloads
  *    that are not a recognized container.
  */
object Multimodal {

  /** One input record: id, media kind ("image" | "audio" | "video"),
    * raw payload bytes. */
  final case class MediaRecord(media_id: Long, kind: String, media: Array[Byte])

  /** Extracted features. width/height/frames come from the container
    * (real for PNG/JPEG/WAV/AVI); f0..f3 are content features (real
    * mean-RGB and mean-intensity for decoded images and sampled MJPEG
    * video frames, byte-derived pseudo-features otherwise);
    * sample_rate/duration_ms are real for parsed WAV audio, duration_ms
    * is real for parsed AVI video (frame count × frame timing),
    * byte-derived stubs for unparsed audio, 0 otherwise. */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int,
      f0: Double, f1: Double, f2: Double, f3: Double,
      sample_rate: Int, duration_ms: Long)

  trait MediaDecoder extends Serializable {
    /** Decode one bounded batch (vectorized-call contract). */
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for a codec: every field is a pure function
    * of the bytes, so a SQL oracle can mirror it —
    *  - width/height: first/second byte mod 64, 1-based
    *  - n_frames: 1 per started 100 bytes for video, else 1
    *    (the frame-sample stub)
    *  - f0..f3: bytes at positions 0/7/14/21 (mod length), scaled /255
    *  - audio: sample_rate 8/16/24 kHz from the third byte,
    *    duration_ms = one ms per payload byte; 0/0 for other kinds.
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
        f0 = b(0) / 255.0, f1 = b(7) / 255.0, f2 = b(14) / 255.0, f3 = b(21) / 255.0,
        sample_rate = if (r.kind == "audio") 8000 * (1 + b(2) % 3) else 0,
        duration_ms = if (r.kind == "audio") r.media.length.toLong else 0L)
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

    private def le16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def le32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) |
        ((b(off + 3) & 0xffL) << 24)) & 0xffffffffL

    /** A parsed WAV container: channel layout, rate, and the `data`
      * chunk size (payload truncation caps it at the bytes present). */
    final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
        blockAlign: Int, dataBytes: Long) {
      /** Sample frames in the data chunk (one frame = one sample across
        * all channels). */
      def frames: Long = dataBytes / blockAlign
      def durationMs: Long = frames * 1000L / sampleRate
    }

    /** WAV/RIFF: `RIFF <size> WAVE`, then a chunk walk for `fmt ` (PCM
      * layout: format/channels/rate/align/bits at LE offsets 0-15) and
      * `data` (payload size). Chunks are word-aligned; unknown chunks
      * (LIST, fact, cue) are skipped by size. "RIFF" is printable, so —
      * per this object's no-misparse rule — the parse only succeeds on
      * the FULL structure: both fourccs, a fmt chunk with a known format
      * code (PCM/float/extensible), a sane rate, and a blockAlign
      * consistent with channels×bits; callers additionally route by the
      * record's declared kind, so prose never reaches this parser. */
    def wavHeader(b: Array[Byte]): Option[WavInfo] = {
      if (b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, align, bits
      var data: Option[Long] = None
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(b, i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
          val code = le16(b, i + 8)
          val ch = le16(b, i + 10)
          val rate = le32(b, i + 12).toInt
          val align = le16(b, i + 20)
          val bits = le16(b, i + 22)
          val codeOk = code == 1 || code == 3 || code == 0xFFFE // PCM / float / extensible
          val layoutOk = ch >= 1 && ch <= 64 && rate >= 1 && rate <= 1000000 &&
            bits % 8 == 0 && bits >= 8 && bits <= 64 && align == ch * bits / 8
          if (!codeOk || !layoutOk) return None
          fmt = Some((ch, rate, align, bits))
        } else if (id == "data") {
          // truncated payloads cap at what is actually present
          data = Some(math.min(size, (b.length - i - 8).toLong))
        }
        if (size > Int.MaxValue - 16) return None
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      for ((ch, rate, align, bits) <- fmt; d <- data)
        yield WavInfo(ch, rate, bits, align, d)
    }

    /** A parsed AVI video stream: real dimensions and frame timing from
      * the `avih` header, and the byte extent of every video frame
      * chunk in the `movi` list — so `n_frames` counts ACTUAL frames
      * present (a lying `dwTotalFrames` cannot inflate it) and frame
      * sampling can slice real per-frame payloads (MJPEG frames are
      * standalone JPEGs, decodable by [[PixelOps.decode]]). */
    final case class AviVideo(width: Int, height: Int, usPerFrame: Long,
        frames: Vector[(Int, Int)]) {
      def nFrames: Int = frames.size
      def durationMs: Long = usPerFrame * frames.size / 1000L
      /** Frame `i`'s payload bytes (for MJPEG: one complete JPEG). */
      def frameBytes(media: Array[Byte], i: Int): Array[Byte] = {
        val (off, len) = frames(i)
        java.util.Arrays.copyOfRange(media, off, off + len)
      }
    }

    /** AVI/RIFF video parse — the same chunk-walk as [[wavHeader]], two
      * levels deeper: `RIFF…AVI ` wraps `LIST hdrl` (whose `avih` chunk
      * carries µs-per-frame at LE offset 0 and width/height at 32/36)
      * and `LIST movi` (whose `NNdc`/`NNdb` chunks are the per-frame
      * payloads; `rec ` sub-lists are descended). Per this object's
      * no-misparse rule ("RIFF" is printable), the parse only succeeds
      * on the full structure: both fourccs, an `avih` with sane
      * dimensions and timing, and a `movi` list — anything less falls
      * back to the stub rather than guessing. */
    def aviVideo(b: Array[Byte]): Option[AviVideo] = {
      if (b.length < 24) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
            b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ')) return None
      val end = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
      var width = 0; var height = 0; var usPerFrame = 0L
      var sawAvih = false; var sawMovi = false
      val frames = Vector.newBuilder[(Int, Int)]
      def fourcc(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // video frame chunk: "NNdc" (compressed) / "NNdb" (uncompressed),
      // NN = two-digit stream number
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db"))
      def walk(from: Int, to: Int, depth: Int, inMovi: Boolean): Boolean = {
        if (depth > 4) return false // spec nesting is 3; deeper = garbage
        var i = from
        while (i + 8 <= to) {
          val id = fourcc(i)
          val size = le32(b, i + 4)
          if (size > Int.MaxValue - 16 || i + 8 + size > to) return false
          val body = i + 8; val bodyEnd = (body + size).toInt
          if (id == "LIST") {
            if (size < 4) return false
            val listType = fourcc(body)
            if (listType == "movi") { sawMovi = true }
            if (!walk(body + 4, bodyEnd, depth + 1,
              inMovi || listType == "movi")) return false
          } else if (id == "avih" && size >= 40) {
            usPerFrame = le32(b, body)
            width = le32(b, body + 32).toInt
            height = le32(b, body + 36).toInt
            sawAvih = true
          } else if (inMovi && isFrameId(id) && id.startsWith("00")) {
            // stream 00 is the video stream in every MJPEG-AVI layout
            // this parser claims; other streams' chunks are skipped
            frames += ((body, size.toInt))
          }
          i = bodyEnd + (size.toInt & 1) // chunks are word-aligned
        }
        true
      }
      if (!walk(12, end, 0, inMovi = false)) return None
      val sane = sawAvih && sawMovi &&
        width >= 1 && width <= 65535 && height >= 1 && height <= 65535 &&
        usPerFrame >= 1 && usPerFrame <= 100000000L
      if (sane) Some(AviVideo(width, height, usPerFrame, frames.result())) else None
    }

    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = batch.map { r =>
      val stub = StubDecoder.decodeBatch(Seq(r)).head
      r.kind match {
        case "image" =>
          imageHeader(r.media) match {
            // real dimensions; f0..f3 stay the stub's byte-derived values
            // (pixel decode lives in PixelDecoder)
            case Some((_, w, h)) => stub.copy(width = w, height = h)
            case None => stub
          }
        case "audio" =>
          wavHeader(r.media) match {
            case Some(w) => stub.copy(
              sample_rate = w.sampleRate, duration_ms = w.durationMs,
              n_frames = math.min(w.frames, Int.MaxValue.toLong).toInt)
            case None => stub
          }
        case "video" =>
          aviVideo(r.media) match {
            // content-true: n_frames counts the movi chunks actually
            // present, duration derives from the header's frame timing
            case Some(v) => stub.copy(width = v.width, height = v.height,
              n_frames = v.nFrames, duration_ms = v.durationMs)
            case None => stub
          }
        case _ => stub
      }
    }
  }

  /** Aspect-preserving fit of `w`×`h` into a `maxW`×`maxH` box — exact
    * integer arithmetic, floor semantics, no floats (the cross-product
    * compare picks the binding dimension). Shared by the metadata-only
    * [[resizeStub]] and the real pixel [[PixelOps.resize]], so the two
    * always agree on target dimensions. */
  def fitBox(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else {
      val byWidth = h.toLong * maxW <= w.toLong * maxH
      if (byWidth) (maxW, math.max(1, (h.toLong * maxW / w).toInt))
      else (math.max(1, (w.toLong * maxH / h).toInt), maxH)
    }

  /** Resize stub: rescales the METADATA only, via [[fitBox]] — the
    * contract [[PixelOps.resize]] applies to actual pixel buffers. */
  def resizeStub(f: MediaFeatures, maxW: Int, maxH: Int): MediaFeatures = {
    val (w2, h2) = fitBox(f.width, f.height, maxW, maxH)
    if (w2 == f.width && h2 == f.height) f else f.copy(width = w2, height = h2)
  }

  /** REAL pixel work — `javax.imageio` (pure JVM, in every JRE): decode
    * PNG/JPEG payloads to pixel buffers, compute content features, and
    * rescale. Used by [[PixelDecoder]] and directly by resize queries. */
  object PixelOps extends Serializable {

    /** Decode to a pixel buffer; None when no installed reader claims
      * the bytes. Memory-cached ImageIO input (no temp-file spill) —
      * payloads already sit in executor memory. */
    def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      javax.imageio.ImageIO.setUseCache(false)
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    }

    /** Content features from the decoded pixels: mean R, G, B and mean
      * intensity ((r+g+b)/3), each scaled to [0,1]. Integer channel sums
      * (exact — no float accumulation order to drift), one double
      * division at the end: deterministic for a given decoded buffer. */
    def meanRgb(img: java.awt.image.BufferedImage): (Double, Double, Double, Double) = {
      val w = img.getWidth; val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      // divide by the pixel count FIRST: a solid-color image's channel
      // sum is an exact multiple of n, so the mean is the exact channel
      // value before the one lossy /255 step
      val n = (w.toLong * h).toDouble
      (sr / n / 255.0, sg / n / 255.0, sb / n / 255.0, (sr + sg + sb) / n / 3.0 / 255.0)
    }

    /** Average-pooled GRAYSCALE grid (row-major `gh` rows × `gw` cols)
      * from the decoded pixels — the perceptual-hash measurement
      * surface. Cell (gx, gy) pools the half-open pixel box
      * [gx·w/gw, (gx+1)·w/gw) × [gy·h/gh, (gy+1)·h/gh) (integer floor
      * bounds — exhaustive and disjoint for any w ≥ gw, h ≥ gh);
      * intensity = ⌊Σ(r+g+b) / (3·pixels)⌋ — integer sums and one floor
      * division, so the grid is deterministic for a given decode. */
    def grayGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Int] = {
      val w = img.getWidth; val h = img.getHeight
      require(w >= gw && h >= gh, s"grayGrid: image ${w}x$h smaller than grid ${gw}x$gh")
      val out = new Array[Int](gw * gh)
      val row = new Array[Int](w)
      var gy = 0
      while (gy < gh) {
        val y0 = gy * h / gh; val y1 = (gy + 1) * h / gh
        val sums = new Array[Long](gw)
        var y = y0
        while (y < y1) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var gx = 0
          while (gx < gw) {
            val x0 = gx * w / gw; val x1 = (gx + 1) * w / gw
            var s = 0L; var x = x0
            while (x < x1) {
              val p = row(x)
              s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            sums(gx) += s
            gx += 1
          }
          y += 1
        }
        var gx = 0
        while (gx < gw) {
          val x0 = gx * w / gw; val x1 = (gx + 1) * w / gw
          out(gy * gw + gx) = (sums(gx) / (3L * (x1 - x0) * (y1 - y0))).toInt
          gx += 1
        }
        gy += 1
      }
      out
    }

    /** Aspect-fit pixel resize into `maxW`×`maxH` (target dims from
      * [[fitBox]] — identical to the metadata stub), bilinear filtering,
      * re-encoded as PNG. Images already inside the box pass through
      * byte-identical. None when the payload doesn't decode. */
    def resize(bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Array[Byte], Int, Int)] =
      decode(bytes).map { img =>
        val (w2, h2) = fitBox(img.getWidth, img.getHeight, maxW, maxH)
        if (w2 == img.getWidth && h2 == img.getHeight) (bytes, w2, h2)
        else {
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w2, h2, null)
          } finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          (baos.toByteArray, w2, h2)
        }
      }
  }

  /** REAL audio sample work on parsed WAV payloads — the PCM tier next
    * to [[PixelOps]]: extract 16-bit samples, pool the energy envelope
    * that feeds the spectral-sign fingerprint (q_audio_dedup). */
  object AudioOps extends Serializable {

    /** First-channel 16-bit PCM samples from a WAV payload: the header
      * must parse ([[HeaderDecoder.wavHeader]]) with bitsPerSample 16;
      * samples are little-endian, strided by blockAlign (channel 0 of
      * an interleaved layout). None when the container or layout does
      * not match — callers fall back rather than guess. */
    def pcm16Samples(b: Array[Byte]): Option[Array[Int]] =
      HeaderDecoder.wavHeader(b).filter(_.bitsPerSample == 16).flatMap { w =>
        // locate the data chunk with the same aligned walk the header
        // parse used (WavInfo carries sizes, not offsets)
        var i = 12
        var dataOff = -1
        var bad = false
        while (i + 8 <= b.length && dataOff < 0 && !bad) {
          val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
          val size = ((b(i + 4) & 0xffL) | ((b(i + 5) & 0xffL) << 8) |
            ((b(i + 6) & 0xffL) << 16) | ((b(i + 7) & 0xffL) << 24))
          if (id == "data") dataOff = i + 8
          else if (size > Int.MaxValue - 16) bad = true
          else i += 8 + size.toInt + (size.toInt & 1)
        }
        if (bad) dataOff = -1
        if (dataOff < 0) None
        else {
          val n = w.frames.toInt
          val out = new Array[Int](n)
          var k = 0
          while (k < n) {
            val off = dataOff + k * w.blockAlign
            out(k) = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
            k += 1
          }
          Some(out)
        }
      }

    /** Energy envelope: `bins` pooled cells of mean ABSOLUTE amplitude
      * (integer floor — the [[PixelOps.grayGrid]] pooling contract on
      * the time axis). Bin k pools the half-open sample range
      * [k·n/bins, (k+1)·n/bins); requires n ≥ bins. The envelope is
      * the fingerprint's measurement surface: `wht_hash` over a
      * power-of-two bin count yields spectral sign bits that are
      * invariant to uniform volume scaling (positive scale preserves
      * every coefficient's sign) — the audio analog of a perceptual
      * hash's brightness invariance. */
    def envelope(samples: Array[Int], bins: Int): Array[Int] = {
      val n = samples.length
      require(n >= bins, s"envelope: $n samples < $bins bins")
      val out = new Array[Int](bins)
      var k = 0
      while (k < bins) {
        val s0 = k * n / bins; val s1 = (k + 1) * n / bins
        var s = 0L; var i = s0
        while (i < s1) { s += math.abs(samples(i).toLong); i += 1 }
        out(k) = (s / (s1 - s0)).toInt
        k += 1
      }
      out
    }
  }

  /** Per-frame dHash sequence of a parsed MJPEG-AVI payload — the
    * video near-dup signature's raw material (q_video_dedup): every
    * `movi` frame decodes through the SAME ImageIO path as images,
    * pools to a `gw`×`gh` grid, and hashes to its gradient-bit string.
    * None when the container does not parse; frames that fail to
    * decode are skipped (truncated tails degrade the signature instead
    * of killing it). */
  def videoFrameHashes(media: Array[Byte], gw: Int = 9, gh: Int = 8): Option[Seq[String]] =
    HeaderDecoder.aviVideo(media).map { v =>
      (0 until v.nFrames).flatMap(i =>
        PixelOps.decode(v.frameBytes(media, i))
          .map(img => dhashLocal(PixelOps.grayGrid(img, gw, gh), gw, gh)))
    }

  /** The production-shaped decoder: REAL pixel decode for every kind —
    * image payloads through `javax.imageio`, WAV audio headers, and
    * MJPEG-in-AVI video (each sampled `movi` frame is a standalone
    * JPEG, decoded through the same ImageIO path as images). Image rows
    * get content-derived features — mean R/G/B and mean intensity —
    * and video rows the same features averaged over sampled frames,
    * instead of the stub's byte probes; container signatures still gate
    * every decode, so prose-as-bytes never reaches ImageIO and falls
    * back to the stub's SQL-mirrorable fields. */
  object PixelDecoder extends MediaDecoder {
    /** Frames decoded per video for content features — bounds the pixel
      * work per row however long the video is (stride spreads the
      * sample across the whole duration). */
    val VideoSampleFrames = 8

    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = batch.map { r =>
      val base = HeaderDecoder.decodeBatch(Seq(r)).head
      r.kind match {
        case "image" if HeaderDecoder.imageHeader(r.media).isDefined =>
          PixelOps.decode(r.media) match {
            case Some(img) =>
              val (f0, f1, f2, f3) = PixelOps.meanRgb(img)
              base.copy(width = img.getWidth, height = img.getHeight,
                f0 = f0, f1 = f1, f2 = f2, f3 = f3)
            case None => base
          }
        case "video" =>
          HeaderDecoder.aviVideo(r.media) match {
            case Some(v) if v.nFrames > 0 =>
              // evenly-strided sample of at most VideoSampleFrames
              // frames; each MJPEG frame decodes like any JPEG. The
              // stride must round UP: floor division decodes up to
              // 2×VideoSampleFrames−1 frames (e.g. 15 frames → stride
              // 1 → all 15), breaking the stated per-row decode bound
              val stride = math.max(1,
                (v.nFrames + VideoSampleFrames - 1) / VideoSampleFrames)
              val means = (0 until v.nFrames by stride)
                .flatMap(i => PixelOps.decode(v.frameBytes(r.media, i)))
                .map(PixelOps.meanRgb)
              if (means.isEmpty) base
              else {
                val n = means.length
                base.copy(
                  f0 = means.map(_._1).sum / n, f1 = means.map(_._2).sum / n,
                  f2 = means.map(_._3).sum / n, f3 = means.map(_._4).sum / n)
              }
            case _ => base
          }
        case _ => base
      }
    }
  }

  /** Frame-sample plan: every `stride`-th frame index of a video — with
    * a parsed AVI these indices address REAL `movi` chunks
    * ([[HeaderDecoder.AviVideo.frameBytes]] slices the payload;
    * production decodes just those frames). */
  def sampleFrames(f: MediaFeatures, stride: Int): Seq[Int] = {
    require(stride > 0, s"frame-sample stride must be positive, got $stride")
    (0 until f.n_frames by stride).toSeq
  }

  /** Difference-hash (dHash) bit string from a row-major `gw`×`gh`
    * intensity-grid ARRAY column: bit (y, x) = 1 iff grid[y·gw+x+1] >
    * grid[y·gw+x] — `gh·(gw−1)` horizontal-gradient bits (9×8 → the
    * classic 64-bit dHash). Declarative (static element_at
    * comparisons, fully codegen'd) so ANY grid source plugs in — real
    * [[PixelOps.grayGrid]] pools on the spec path, byte-probe stub
    * grids on the oracled path — and SQL replays it verbatim. Emits
    * the [[graft.operators.Dedup.simhash]] bit-string shape:
    * [[graft.operators.Dedup.simhashPairs]] does the banded Hamming
    * matching unchanged (q_media_dedup). */
  def dhashBits(grid: org.apache.spark.sql.Column, gw: Int, gh: Int): org.apache.spark.sql.Column = {
    require(gw >= 2 && gh >= 1, s"dhashBits: grid must be at least 2x1, got ${gw}x$gh")
    import org.apache.spark.sql.functions.{concat, element_at, when, lit}
    // bindOnce: ~2·gw·gh grid references — see [[phashBits]]
    bindOnce(grid) { g =>
      concat((for (y <- 0 until gh; x <- 0 until gw - 1) yield {
        val i = y * gw + x
        when(element_at(g, i + 2) > element_at(g, i + 1), lit("1")).otherwise(lit("0"))
      }): _*)
    }
  }

  /** pHash-style LOW-FREQUENCY perceptual hash over a row-major 8×8
    * intensity-grid ARRAY column: the grid's 2-D Walsh-Hadamard
    * transform (H₈⊗H₈ — the integer-exact stand-in for classic pHash's
    * DCT: same "hash the coarse structure, ignore pixel noise" idea,
    * but every coefficient is a ±1-signed SUM of grid cells, so both
    * engines agree bit-for-bit and the oracle replays it verbatim),
    * one sign bit per non-DC coefficient. Coefficient k (1..63, DC
    * excluded — it is positive for any image) is
    * `Σ_j (−1)^popcount(k & j) · grid[j]` — the (kr, kc) factorization
    * of H₈⊗H₈ collapses to one popcount because popcount splits across
    * the row/col bit fields. 63 bits = 3 bands × 21 for
    * [[graft.operators.Dedup.simhashPairs]] (pigeonhole-complete at
    * radius 2 < 3).
    *
    * Why this complements [[dhashBits]]: dHash reads LOCAL gradients
    * (one noisy cell flips its two neighbor comparisons), WHT bits
    * read GLOBAL structure (a grid-scale perturbation lands in the one
    * coefficient whose sign pattern it matches and leaves the other 62
    * alone — MultimodalSpec plants exactly that). */
  def phashBits(grid: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // one native codegen'd O(n log n) butterfly per row
    // ([[graft.expressions.WhtHash]]; callers ensure registration —
    // the declarative HOF spelling of the same math was interpreted
    // at ~n² boxed steps per row, measured 4.8 s vs sub-second on the
    // sf0.1 image surface)
    org.apache.spark.sql.functions.call_function("wht_hash", grid)

  /** Evaluate `c` ONCE per row and hand the bound value to `f` — the
    * single-element-array + transform spelling: a lambda variable is
    * evaluated by value, where a plain Column alias may be inlined
    * back into every reference by projection collapse. */
  private def bindOnce(c: org.apache.spark.sql.Column)(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    element_at(transform(array(c), f), 1)
  }

  /** Local mirror of [[phashBits]] — the spec's independent reference. */
  def phashLocal(grid: Array[Int]): String = {
    require(grid.length == 64, s"phashLocal: grid length ${grid.length} != 64")
    val sb = new StringBuilder(63)
    for (k <- 1 to 63) {
      var s = 0L
      for (j <- 0 until 64)
        s += grid(j).toLong * (if (java.lang.Integer.bitCount(k & j) % 2 == 0) 1L else -1L)
      sb.append(if (s > 0) '1' else '0')
    }
    sb.toString
  }

  /** Local mirror of [[dhashBits]] over an in-memory grid — the spec's
    * independent reference and the scalar form for driver-side use. */
  def dhashLocal(grid: Array[Int], gw: Int, gh: Int): String = {
    require(grid.length == gw * gh, s"dhashLocal: grid length ${grid.length} != $gw*$gh")
    val sb = new StringBuilder(gh * (gw - 1))
    for (y <- 0 until gh; x <- 0 until gw - 1) {
      val i = y * gw + x
      sb.append(if (grid(i + 1) > grid(i)) '1' else '0')
    }
    sb.toString
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
