package graft.queries

/** REAL-container media synthesis for the oracled pixel/PCM/frame
  * artifacts: every corpus media row gets an actual PNG / WAV / MJPEG-AVI
  * payload whose CONTENT derives deterministically from the row's text
  * — so the REAL decoders ([[graft.operators.Multimodal.PixelOps]],
  * `AudioOps`, `videoFrameHashes`) run end to end, near-duplicate texts
  * yield near-duplicate media, and the derived measurement surfaces
  * (pixel grids, envelopes, frame hashes) persist as [[OracleArtifact]]
  * frames both engines read.
  *
  * The content maps are built around the invariances the perceptual
  * fingerprints claim:
  *
  *  - images: the pattern probes the first [[ProbeLen]] chars (the
  *    corpus minimum length, so near-dups sharing a prefix agree) and
  *    the text LENGTH shifts global brightness — near-dup pairs differ
  *    by a constant offset, exactly what dHash's gradient bits and the
  *    WHT's non-DC signs are invariant to;
  *  - audio: the same probe pattern drives the samples and the length
  *    scales global VOLUME — the spectral-sign fingerprint is
  *    invariant to positive scaling;
  *  - video: frame k renders chars [k·[[ProbeLen]], (k+1)·[[ProbeLen]])
  *    (wrapping), so a suffix-level text difference perturbs only the
  *    frames that cover it and the frame-hash shingle signature
  *    degrades gradually — the property the minhash matcher measures.
  *
  * Writers emit honest containers (checked against this repo's own
  * parsers AND `javax.imageio` in MediaSynthSpec); JPEG frames go
  * through the real ImageIO encoder.
  */
private[graft] object MediaSynth {

  /** Probe-window length. Texts shorter than this (they exist: the
    * sf0.1 corpus bottoms out at 44 chars) are deterministically
    * padded for PROBING only — length-derived brightness/volume/frame
    * count always read the original length. */
  val ProbeLen = 48

  private def padded(text: String): String =
    if (text.length >= ProbeLen) text else text.padTo(ProbeLen, '.')

  val ImgW = 36; val ImgH = 32
  val FrameW = 24; val FrameH = 16
  val AudioSamples = 4096; val AudioRate = 8000
  val FrameUs = 40000L // 25 fps

  // ---- content maps ----

  /** Image-probe modulus: PRIME, and chosen so the probe map stays
    * non-degenerate under the hash's 4-pixel pooling stride — with a
    * modulus dividing 4·[[ImgW]]·7 (e.g. the naive [[ProbeLen]] = 48),
    * every pooled grid row would probe the SAME text positions and the
    * 64-bit hash would collapse to 8 effective bits (measured: 18% of
    * ALL image pairs landed at Hamming ≤ 2). 47 is coprime to every
    * stride in play, so each grid cell pools its own position set. */
  val ImgProbeMod = 47

  private def probe(text: String, i: Int): Int = text.charAt(i % ImgProbeMod).toInt

  /** Image: gray pattern from strided text probes + length-derived
    * brightness offset. Values stay well inside 0..255 (ASCII 32..126
    * plus < 29). */
  def pngFor(text: String): Array[Byte] = {
    val p = padded(text)
    val bright = text.length % 29
    pngBytes(ImgW, ImgH, (x, y) => probe(p, (y * ImgW + x) * 7) + bright)
  }

  /** Audio: mono 16-bit PCM whose probe index advances at ENVELOPE
    * scale — sample i reads char ⌊i·[[ProbeLen]]/[[AudioSamples]]⌋, so
    * each of the 64 envelope bins pools ~¾ of one character's constant
    * amplitude and the envelope carries the text's character pattern.
    * (A fast per-sample stride would cycle the whole probe set inside
    * every bin and flatten the envelope into noise — near-tie WHT
    * coefficients whose signs collide across unrelated docs.) Volume
    * scales with the text length; the fingerprint is invariant to it. */
  def wavFor(text: String): Array[Byte] = {
    val p = padded(text)
    val scale = 1.0 + (text.length % 7) * 0.01
    val samples = new Array[Short](AudioSamples)
    var i = 0
    while (i < AudioSamples) {
      val c = p.charAt(i * ProbeLen / AudioSamples).toInt
      samples(i) = math.round((c - 80) * 256 * scale).toShort
      i += 1
    }
    wavBytes(AudioRate, samples)
  }

  /** Number of frames a document's video carries: 4 plus one per 100
    * chars, capped at 10 (the stub decoder's growth rule, bounded). */
  def nFramesFor(text: String): Int = math.min(4 + text.length / 100, 10)

  /** Video: MJPEG-AVI whose frame k renders the text chunk starting at
    * k·[[ProbeLen]] (wrapping) — REAL JPEGs through ImageIO. */
  def aviFor(text: String): Array[Byte] = {
    val p = padded(text)
    val frames = (0 until nFramesFor(text)).map { k =>
      // frame k renders ONLY its chunk [k·ProbeLen, (k+1)·ProbeLen),
      // tiled across the pixels: a localized text difference perturbs
      // exactly the frames whose chunk covers it
      jpegBytes(FrameW, FrameH, (x, y) =>
        p.charAt((k * ProbeLen + (y * FrameW + x) % ProbeLen) % p.length).toInt * 2)
    }
    aviBytes(FrameW, FrameH, FrameUs, frames)
  }

  // ---- container writers ----

  private def grayImage(w: Int, h: Int, f: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, fmt, baos), s"no ImageIO writer for $fmt")
    baos.toByteArray
  }

  /** A real PNG (lossless: decode returns these exact pixels). */
  def pngBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    encode(grayImage(w, h, f), "png")

  /** A real JPEG (lossy: decoded pixels approximate `f`). */
  def jpegBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    encode(grayImage(w, h, f), "jpg")

  private final class LeBuf {
    val out = new java.io.ByteArrayOutputStream()
    def bytes(bs: Array[Byte]): Unit = out.write(bs)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
  }

  /** A real mono 16-bit PCM WAV (44-byte canonical header + data). */
  def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val b = new LeBuf
    val dataLen = samples.length * 2
    b.ascii("RIFF"); b.le32(36L + dataLen); b.ascii("WAVE")
    b.ascii("fmt "); b.le32(16)
    b.le16(1); b.le16(1) // PCM, mono
    b.le32(rate); b.le32(rate * 2L) // byte rate
    b.le16(2); b.le16(16) // block align, bits
    b.ascii("data"); b.le32(dataLen)
    samples.foreach(s => b.le16(s & 0xffff))
    b.out.toByteArray
  }

  /** A real MJPEG-AVI: `RIFF AVI ` wrapping `LIST hdrl { avih }` and
    * `LIST movi { 00dc… }` — the exact structure
    * [[graft.operators.Multimodal.HeaderDecoder.aviVideo]] demands
    * (chunks word-aligned, frame count content-true). */
  def aviBytes(w: Int, h: Int, usPerFrame: Long, frames: Seq[Array[Byte]]): Array[Byte] = {
    // avih: 56-byte body — µsPerFrame @0, totalFrames @16, w/h @32/36
    val avih = new LeBuf
    avih.le32(usPerFrame); avih.le32(0); avih.le32(0); avih.le32(0)
    avih.le32(frames.size.toLong); avih.le32(0); avih.le32(1); avih.le32(0)
    avih.le32(w.toLong); avih.le32(h.toLong)
    avih.le32(0); avih.le32(0); avih.le32(0); avih.le32(0)
    val avihBody = avih.out.toByteArray

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = new LeBuf
      b.ascii(id); b.le32(body.length.toLong); b.bytes(body)
      if (body.length % 2 == 1) b.out.write(0) // word alignment
      b.out.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = new LeBuf
      b.ascii("LIST"); b.le32(4L + body.length); b.ascii(kind); b.bytes(body)
      b.out.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avihBody))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val b = new LeBuf
    b.ascii("RIFF"); b.le32(4L + hdrl.length + movi.length); b.ascii("AVI ")
    b.bytes(hdrl); b.bytes(movi)
    b.out.toByteArray
  }
}
