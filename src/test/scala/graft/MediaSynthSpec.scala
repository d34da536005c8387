package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioOps, HeaderDecoder, PixelOps}
import graft.queries.MediaSynth
import org.scalatest.funsuite.AnyFunSuite

/** The REAL-media synthesis behind the artifact-backed oracle rows
  * (q_media_dedup_px / q_media_phash_px / q_audio_dedup /
  * q_audio_fingerprint / q_video_dedup): containers must parse with
  * this repo's own parsers AND decode with the standard library, the
  * fingerprints must exhibit the invariances the content maps plant
  * (brightness for pixels, volume for PCM), and planted near-dup /
  * distinct media must land on the right side of each matcher. */
class MediaSynthSpec extends AnyFunSuite {

  // two texts agreeing on a long prefix, differing in length — the
  // corpus's near-dup shape (a suffix-level edit)
  private val BaseText = ("the quick brown fox jumps over the lazy dog again and again " * 8).trim
  private def withLen(n: Int): String =
    (BaseText * (n / BaseText.length + 1)).substring(0, n)

  test("pngFor emits a real PNG: header parses, ImageIO decodes, pixels match the map") {
    val t = withLen(300)
    val png = MediaSynth.pngFor(t)
    assert(HeaderDecoder.imageHeader(png).contains(("png", MediaSynth.ImgW, MediaSynth.ImgH)))
    val img = PixelOps.decode(png).get
    assert(img.getWidth == MediaSynth.ImgW && img.getHeight == MediaSynth.ImgH)
    // PNG is lossless: a probed pixel equals the content map exactly
    val bright = t.length % 29
    val want = t.charAt((5 * MediaSynth.ImgW + 7) * 7 % MediaSynth.ImgProbeMod).toInt + bright
    assert((img.getRGB(7, 5) & 0xff) == want)
  }

  test("brightness invariance: length-shifted near-dup texts hash identically from real pixels") {
    // same 47-char probe window, different length → constant brightness
    // offset on every pixel → dHash and WHT signs both invariant
    val a = withLen(400); val b = withLen(408)
    assert(a.take(MediaSynth.ImgProbeMod) == b.take(MediaSynth.ImgProbeMod))
    assert(a.length % 29 != b.length % 29) // the offset actually differs
    def grids(t: String) = {
      val img = PixelOps.decode(MediaSynth.pngFor(t)).get
      (PixelOps.grayGrid(img, 9, 8), PixelOps.grayGrid(img, 8, 8))
    }
    val (ga9, ga8) = grids(a); val (gb9, gb8) = grids(b)
    assert(!ga9.sameElements(gb9)) // the grids DO differ (by the offset)
    assert(Multimodal.dhashLocal(ga9, 9, 8) == Multimodal.dhashLocal(gb9, 9, 8))
    assert(Multimodal.phashLocal(ga8) == Multimodal.phashLocal(gb8))
    // an unrelated text lands far away in both hashes
    val other = ("colorless green ideas sleep furiously beside the river bank " * 8).trim
    val (go9, go8) = grids(withLen(0) + other.substring(0, 300))
    def ham(x: String, y: String) = x.zip(y).count { case (p, q) => p != q }
    assert(ham(Multimodal.dhashLocal(ga9, 9, 8), Multimodal.dhashLocal(go9, 9, 8)) > 2)
    assert(ham(Multimodal.phashLocal(ga8), Multimodal.phashLocal(go8)) > 2)
  }

  test("wavFor emits a real WAV: header parses, PCM round-trips, envelope pools it") {
    val t = withLen(300)
    val wav = MediaSynth.wavFor(t)
    val info = HeaderDecoder.wavHeader(wav).get
    assert(info.sampleRate == MediaSynth.AudioRate && info.bitsPerSample == 16)
    assert(info.frames == MediaSynth.AudioSamples)
    val pcm = AudioOps.pcm16Samples(wav).get
    assert(pcm.length == MediaSynth.AudioSamples)
    // round-trip: sample i equals the content map exactly
    val scale = 1.0 + (t.length % 7) * 0.01
    val i = 1000
    val want = math.round((t.charAt(i * MediaSynth.ProbeLen / MediaSynth.AudioSamples) - 80) * 256 * scale).toInt
    assert(pcm(i) == want)
    val env = AudioOps.envelope(pcm, 64)
    assert(env.length == 64 && env.exists(_ > 0))
  }

  test("volume invariance: length-scaled near-dup WAVs fingerprint within the match radius") {
    val a = withLen(401); val b = withLen(404) // scales 1.02 vs 1.05
    assert(a.length % 7 != b.length % 7)
    def fp(t: String) = Multimodal.phashLocal(
      AudioOps.envelope(AudioOps.pcm16Samples(MediaSynth.wavFor(t)).get, 64))
    def ham(x: String, y: String) = x.zip(y).count { case (p, q) => p != q }
    // signs are scale-invariant up to per-sample rounding: within the
    // banded matcher's radius (and in practice exactly equal)
    assert(ham(fp(a), fp(b)) <= 2)
    val other = ("colorless green ideas sleep furiously beside the river bank " * 8).trim
    assert(ham(fp(a), fp(other.substring(0, 300))) > 2)
  }

  test("aviFor emits a real MJPEG-AVI: structure parses, frames decode, hashes localize edits") {
    val t = withLen(420) // 8 frames
    val avi = MediaSynth.aviFor(t)
    val v = HeaderDecoder.aviVideo(avi).get
    assert(v.width == MediaSynth.FrameW && v.height == MediaSynth.FrameH)
    assert(v.nFrames == MediaSynth.nFramesFor(t) && v.nFrames == 8)
    assert(v.usPerFrame == MediaSynth.FrameUs)
    // every movi chunk is a real standalone JPEG
    (0 until v.nFrames).foreach { i =>
      val img = PixelOps.decode(v.frameBytes(avi, i)).get
      assert(img.getWidth == MediaSynth.FrameW && img.getHeight == MediaSynth.FrameH)
    }
    val hs = Multimodal.videoFrameHashes(avi).get
    assert(hs.size == 8 && hs.forall(_.length == 64))
    // an edit INSIDE frame 3's chunk changes frame 3's hash only
    val edited = t.substring(0, 3 * MediaSynth.ProbeLen + 10) + "QQQQQQQQ" +
      t.substring(3 * MediaSynth.ProbeLen + 18)
    val hs2 = Multimodal.videoFrameHashes(MediaSynth.aviFor(edited)).get
    assert(hs2.size == 8)
    assert(hs.zip(hs2).zipWithIndex.forall { case ((x, y), k) => (x == y) == (k != 3) },
      "edit did not localize to frame 3")
  }

  /** Shingle-set Jaccard of two frame-hash sequences (k = 2). */
  private def vidJaccard(a: Seq[String], b: Seq[String]): Double = {
    def sh(s: Seq[String]) = s.zip(s.tail).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("video variants: truncated / locally-edited / re-encoded pair; distinct does not") {
    val t = withLen(460) // 8 frames
    val orig = MediaSynth.aviFor(t)
    val hs = Multimodal.videoFrameHashes(orig).get
    val v = HeaderDecoder.aviVideo(orig).get

    // truncated: first 6 of 8 frames re-wrapped — a prefix cut
    val truncated = MediaSynth.aviBytes(MediaSynth.FrameW, MediaSynth.FrameH,
      MediaSynth.FrameUs, (0 until 6).map(v.frameBytes(orig, _)))
    val hsT = Multimodal.videoFrameHashes(truncated).get
    assert(hsT == hs.take(6))
    assert(vidJaccard(hs, hsT) >= 0.5, s"truncated J=${vidJaccard(hs, hsT)}")

    // locally edited: one frame's content changed
    val edited = t.substring(0, 5 * MediaSynth.ProbeLen + 4) + "ZZZZZZ" +
      t.substring(5 * MediaSynth.ProbeLen + 10)
    val hsE = Multimodal.videoFrameHashes(MediaSynth.aviFor(edited)).get
    assert(vidJaccard(hs, hsE) >= 0.5, s"edited J=${vidJaccard(hs, hsE)}")

    // re-encoded: every frame decoded and re-compressed through ImageIO
    // — the strong-gradient content map keeps every pooled dHash stable
    val reenc = MediaSynth.aviBytes(MediaSynth.FrameW, MediaSynth.FrameH,
      MediaSynth.FrameUs, (0 until v.nFrames).map { i =>
        val img = PixelOps.decode(v.frameBytes(orig, i)).get
        MediaSynth.jpegBytes(MediaSynth.FrameW, MediaSynth.FrameH,
          (x, y) => img.getRGB(x, y) & 0xff)
      })
    val hsR = Multimodal.videoFrameHashes(reenc).get
    assert(vidJaccard(hs, hsR) >= 0.5, s"re-encoded J=${vidJaccard(hs, hsR)}")

    // distinct content shares (essentially) nothing
    val other = ("colorless green ideas sleep furiously beside the river bank " * 10).trim
    val hsO = Multimodal.videoFrameHashes(MediaSynth.aviFor(other.substring(0, 460))).get
    assert(vidJaccard(hs, hsO) < 0.5, s"distinct J=${vidJaccard(hs, hsO)}")
  }

  test("envelope pooling contract: floor bounds, exhaustive, matches a naive mirror") {
    val rnd = new scala.util.Random(3)
    val samples = Array.fill(1000)(rnd.nextInt(65536) - 32768)
    val env = AudioOps.envelope(samples, 64)
    (0 until 64).foreach { k =>
      val s0 = k * 1000 / 64; val s1 = (k + 1) * 1000 / 64
      val want = (s0 until s1).map(i => math.abs(samples(i).toLong)).sum / (s1 - s0)
      assert(env(k) == want.toInt, s"bin $k")
    }
    intercept[IllegalArgumentException](AudioOps.envelope(Array(1, 2), 64))
  }
}
