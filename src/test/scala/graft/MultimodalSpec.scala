package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRecord}
import org.apache.spark.sql.functions.col
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
    val f = Multimodal.MediaFeatures(1L, "image", 10L, 64, 32, 1, 0, 0, 0, 0, 0, 0L)
    val r = Multimodal.resizeStub(f, 16, 16)
    assert(r.width == 16 && r.height == 8) // 2:1 aspect kept
    assert(Multimodal.resizeStub(f, 100, 100) eq f)
    val tall = Multimodal.MediaFeatures(2L, "image", 10L, 10, 60, 1, 0, 0, 0, 0, 0, 0L)
    val r2 = Multimodal.resizeStub(tall, 16, 12)
    assert(r2.height == 12 && r2.width == 2)
  }

  // --- real container-header parsing (HeaderDecoder) ---

  /** Minimal valid PNG prefix: signature + IHDR length/tag + w/h. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  /** Minimal JPEG: SOI, an APP0 segment to skip, then SOF0 with h/w. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0x4A)
    val sof0 = Array(0xFF, 0xC0, 0x00, 0x11,
      8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3)
    (Array(0xFF, 0xD8) ++ app0 ++ sof0).map(_.toByte)
  }

  test("HeaderDecoder: real PNG and JPEG dimensions from actual header bytes") {
    assert(Multimodal.HeaderDecoder.imageHeader(pngBytes(640, 480)) == Some(("png", 640, 480)))
    assert(Multimodal.HeaderDecoder.imageHeader(jpegBytes(1920, 1080)) == Some(("jpeg", 1920, 1080)))
    // dimensions above the stub's 64-cap prove the real path was taken
    val recs = Seq(
      MediaRecord(1L, "image", pngBytes(640, 480)),
      MediaRecord(2L, "image", jpegBytes(333, 77)),
      MediaRecord(3L, "image", "just some prose, not an image".getBytes("UTF-8")))
    val out = Multimodal.HeaderDecoder.decodeBatch(recs).map(f => f.media_id -> f).toMap
    assert((out(1L).width, out(1L).height) == ((640, 480)))
    assert((out(2L).width, out(2L).height) == ((333, 77)))
    // non-container payloads keep the stub's documented pseudo-dims
    val stub = Multimodal.StubDecoder.decodeBatch(Seq(recs(2))).head
    assert(out(3L) == stub)
  }

  test("HeaderDecoder: truncated/corrupt containers fall back instead of guessing") {
    assert(Multimodal.HeaderDecoder.imageHeader(pngBytes(640, 480).take(20)).isEmpty)
    assert(Multimodal.HeaderDecoder.imageHeader(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
    assert(Multimodal.HeaderDecoder.imageHeader(Array[Byte]()).isEmpty)
    // zero dimensions are invalid, not "a 0x0 image"
    assert(Multimodal.HeaderDecoder.imageHeader(pngBytes(0, 480)).isEmpty)
    // ASCII text can never be claimed (PNG/JPEG lead bytes are non-ASCII)
    assert(Multimodal.HeaderDecoder.imageHeader("GIF89a pretend".getBytes("US-ASCII")).isEmpty)
  }

  // --- real pixel decode + resize (PixelDecoder / PixelOps) ---

  /** A real encoded image: solid rgb fill, any size, png or jpeg. */
  private def realImage(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) } finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  test("PixelDecoder: content-derived mean-RGB features from real decoded pixels") {
    val png = realImage(80, 40, 0xC86432, "png") // r=200 g=100 b=50
    val jpg = realImage(33, 77, 0x808080, "jpg") // gray — JPEG-stable
    val out = Multimodal.PixelDecoder.decodeBatch(Seq(
        MediaRecord(1L, "image", png), MediaRecord(2L, "image", jpg),
        MediaRecord(3L, "image", "prose payload, not an image".getBytes("UTF-8"))))
      .map(f => f.media_id -> f).toMap
    // PNG is lossless: means are EXACT channel values
    assert(out(1L).width == 80 && out(1L).height == 40)
    assert(out(1L).f0 == 200 / 255.0 && out(1L).f1 == 100 / 255.0 && out(1L).f2 == 50 / 255.0)
    assert(out(1L).f3 == (200 + 100 + 50) / 3.0 / 255.0)
    // JPEG is lossy: solid gray survives within a small tolerance
    assert(out(2L).width == 33 && out(2L).height == 77)
    assert(math.abs(out(2L).f0 - 128 / 255.0) < 0.02 && math.abs(out(2L).f2 - 128 / 255.0) < 0.02)
    // non-image payloads keep the stub's documented fields
    assert(out(3L) == Multimodal.StubDecoder.decodeBatch(
      Seq(MediaRecord(3L, "image", "prose payload, not an image".getBytes("UTF-8")))).head)
  }

  private def paintedPng(w: Int, h: Int)(rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("perceptual dHash: near-identical real images within radius, different images far") {
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // 90x80 → 9x8 grid of 10x10 cells. A: horizontal gradient (cell
    // means strictly increase left→right → all-ones dHash)
    val a = paintedPng(90, 80)((x, _) => gray(x * 255 / 89))
    // B: same gradient with ONE cell blacked out — exactly one
    // horizontal comparison flips (cell4>cell3 was 1, goes 0; cell5>cell4
    // stays 1), so dist(A,B) = 1
    val b = paintedPng(90, 80)((x, y) =>
      if (x >= 40 && x < 50 && y >= 30 && y < 40) gray(0) else gray(x * 255 / 89))
    // C: vertical gradient — within-row cells equal, no bit is ever 1
    val c = paintedPng(90, 80)((_, y) => gray(y * 255 / 79))
    def gridOf(bytes: Array[Byte]) =
      Multimodal.PixelOps.grayGrid(Multimodal.PixelOps.decode(bytes).get, 9, 8)
    def hash(bytes: Array[Byte]) = Multimodal.dhashLocal(gridOf(bytes), 9, 8)
    def dist(x: String, y: String) = x.zip(y).count { case (p, q) => p != q }
    val (ha, hb, hc) = (hash(a), hash(b), hash(c))
    assert(ha == "1" * 64 && hc == "0" * 64)
    assert(dist(ha, hb) == 1)
    assert(dist(ha, hc) == 64 && dist(hb, hc) == 63)
    // solid color pools to a constant grid
    assert(gridOf(realImage(18, 16, 0x646464, "png")).forall(_ == 100))
    // the declarative dhashBits expression == the local mirror, and the
    // banded Hamming matcher pairs EXACTLY the near-identical pair
    val grids = Seq(1L -> gridOf(a), 2L -> gridOf(b), 3L -> gridOf(c))
    val sig = grids.map { case (id, g) => (id, g.toSeq) }.toDF("id", "grid")
      .select(col("id"), Multimodal.dhashBits(col("grid"), 9, 8).as("simhash"))
    val exprHashes = sig.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(exprHashes == Map(1L -> ha, 2L -> hb, 3L -> hc))
    val pairs = graft.operators.Dedup.simhashPairs(sig, maxDist = 2, sigLen = 64, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1)))
  }

  test("WHT pHash: grid-scale noise flips ONE bit where dHash flips many; expression == mirror") {
    graft.GraftFunctions.ensure(spark)
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // 80x80 → 8x8 grid of 10x10 cells; base = horizontal gradient kept
    // inside [24, 231] so the ±24 block perturbation never clamps
    val base = paintedPng(80, 80)((x, _) => gray(24 + x * 207 / 79))
    // block checkerboard aligned WITH the pooling cells: +24 on even
    // (row+col) cells, −24 on odd — survives pooling intact, and its
    // sign pattern IS the (1,1) Walsh coefficient (k = 9), so exactly
    // one WHT bit can flip while every other coefficient is untouched
    val noisy = paintedPng(80, 80)((x, y) =>
      gray(24 + x * 207 / 79 + (if (((x / 10) + (y / 10)) % 2 == 0) 24 else -24)))
    def grid8(bytes: Array[Byte]) =
      Multimodal.PixelOps.grayGrid(Multimodal.PixelOps.decode(bytes).get, 8, 8)
    def dist(a: String, b: String) = a.zip(b).count { case (p, q) => p != q }
    val (gb, gn) = (grid8(base), grid8(noisy))
    val (pb, pn) = (Multimodal.phashLocal(gb), Multimodal.phashLocal(gn))
    assert(dist(pb, pn) <= 1, s"pHash moved ${dist(pb, pn)} bits under grid-scale noise")
    // dHash reads local gradients: the alternating ±24 blocks flip a
    // large fraction of the same 8×8 grid's 56 horizontal comparisons
    val (db, dn) = (Multimodal.dhashLocal(gb, 8, 8), Multimodal.dhashLocal(gn, 8, 8))
    assert(dist(db, dn) >= 10, s"dHash moved only ${dist(db, dn)} bits")
    // the native expression equals the local mirror on real grids
    val out = Seq(1L -> gb.toSeq, 2L -> gn.toSeq).toDF("id", "grid")
      .select(col("id"), Multimodal.phashBits(col("grid")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> pb, 2L -> pn))
    // banded matcher pairs the planted near-identical pair at radius 2
    val sig = Seq(1L -> gb.toSeq, 2L -> gn.toSeq).toDF("id", "grid")
      .select(col("id"), Multimodal.phashBits(col("grid")).as("simhash"))
    val pairs = graft.operators.Dedup.simhashPairs(sig, maxDist = 2, sigLen = 63, bands = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("PixelOps.resize: real pixels through an aspect-fit rescale, re-decodable") {
    val png = realImage(64, 32, 0x3264C8, "png")
    val (bytes2, w2, h2) = Multimodal.PixelOps.resize(png, 16, 16).get
    assert((w2, h2) == ((16, 8)), "fitBox dims must match the metadata stub")
    // the resized payload is a real image with those dimensions
    val back = Multimodal.PixelOps.decode(bytes2).get
    assert(back.getWidth == 16 && back.getHeight == 8)
    // solid color survives bilinear rescale exactly
    val (f0, f1, f2, _) = Multimodal.PixelOps.meanRgb(back)
    assert(f0 == 0x32 / 255.0 && f1 == 0x64 / 255.0 && f2 == 0xC8 / 255.0)
    // already inside the box: byte-identical pass-through
    val small = realImage(10, 10, 0xFFFFFF, "png")
    assert(Multimodal.PixelOps.resize(small, 16, 16).get._1 eq small)
    // undecodable payloads say so instead of guessing
    assert(Multimodal.PixelOps.resize("not an image".getBytes, 16, 16).isEmpty)
  }

  test("PixelDecoder end-to-end through extractFeatures (mapPartitions contract)") {
    val rows = Seq(
      (1L, "image", realImage(80, 40, 0xC86432, "png")),
      (2L, "image", "prose".getBytes("UTF-8")),
      (3L, "video", Array.fill(250)(7.toByte)))
      .toDF("media_id", "kind", "media")
    val out = Multimodal.extractFeatures(rows.repartition(2), Multimodal.PixelDecoder, 8)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width == 80 && out(1L).f0 == 200 / 255.0)
    assert(out(2L).width <= 64, "stub fallback for non-container payloads")
    assert(out(3L).n_frames == 3, "non-AVI video payload falls back to the stub")
  }

  // --- real WAV/RIFF audio headers ---

  /** A real little-endian WAV: PCM fmt chunk + data chunk of `dataBytes`. */
  private def wavBytes(channels: Int, rate: Int, bits: Int, dataBytes: Int,
      extraChunk: Boolean = false): Array[Byte] = {
    val align = channels * bits / 8
    val extra = if (extraChunk) 8 + 4 else 0
    val out = java.nio.ByteBuffer.allocate(44 + extra + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * align).putShort(align.toShort).putShort(bits.toShort)
    if (extraChunk) out.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      .put(Array.fill(dataBytes)(0x11.toByte))
    out.array()
  }

  test("HeaderDecoder: real WAV rate/duration/frames; corrupt audio falls back to the stub") {
    // mono 8 kHz 16-bit, 16000 data bytes = 8000 frames = exactly 1 s
    val wav = wavBytes(channels = 1, rate = 8000, bits = 16, dataBytes = 16000)
    val out = Multimodal.HeaderDecoder.decodeBatch(Seq(MediaRecord(1L, "audio", wav))).head
    assert(out.sample_rate == 8000 && out.duration_ms == 1000 && out.n_frames == 8000)
    // unknown chunks (LIST) are skipped by size, stereo layout honored
    val st = wavBytes(channels = 2, rate = 44100, bits = 16, dataBytes = 44100 * 4 / 2, extraChunk = true)
    val f2 = Multimodal.HeaderDecoder.decodeBatch(Seq(MediaRecord(2L, "audio", st))).head
    assert(f2.sample_rate == 44100 && f2.duration_ms == 500)
    // prose starting with RIFF letters is NOT audio: full structure required
    val prose = MediaRecord(3L, "audio", "RIFF raff prose that is not a wave file at all, honest".getBytes)
    assert(Multimodal.HeaderDecoder.decodeBatch(Seq(prose)).head ==
      Multimodal.StubDecoder.decodeBatch(Seq(prose)).head)
    // truncated header: stub fallback, no guessing
    val trunc = MediaRecord(4L, "audio", wav.take(30))
    assert(Multimodal.HeaderDecoder.decodeBatch(Seq(trunc)).head ==
      Multimodal.StubDecoder.decodeBatch(Seq(trunc)).head)
    // a truncated DATA payload caps duration at the bytes present
    val cut = Multimodal.HeaderDecoder.decodeBatch(
      Seq(MediaRecord(5L, "audio", wav.take(44 + 8000)))).head
    assert(cut.duration_ms == 500, s"expected capped 500ms, got ${cut.duration_ms}")
  }

  // --- real MJPEG-in-AVI video ---

  /** A real MJPEG-in-AVI container: `RIFF('AVI '){ LIST(hdrl){avih},
    * LIST(movi){00dc × frames} }` — every frame a standalone JPEG, the
    * layout `aviVideo` claims. `totalFramesInHeader` lets a test LIE in
    * `dwTotalFrames` to prove the parser counts actual movi chunks. */
  private def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                       usPerFrame: Long = 40000L,
                       totalFramesInHeader: Option[Int] = None): Array[Byte] = {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] = if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    val avih = new Array[Byte](56)
    System.arraycopy(le32(usPerFrame), 0, avih, 0, 4)
    System.arraycopy(le32(totalFramesInHeader.getOrElse(frames.size).toLong), 0, avih, 16, 4)
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ chunk("avih", avih))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  test("HeaderDecoder: real AVI — dims from avih, n_frames from ACTUAL movi chunks") {
    val frames = Seq(0xC86432, 0x808080, 0x404040, 0x202020, 0xA0A0A0)
      .map(realImage(48, 32, _, "jpg"))
    // header LIES (claims 99 frames): the count must come from the movi walk
    val avi = aviBytes(frames, 48, 32, usPerFrame = 40000L, totalFramesInHeader = Some(99))
    val f = Multimodal.HeaderDecoder.decodeBatch(Seq(MediaRecord(1L, "video", avi))).head
    assert(f.width == 48 && f.height == 32)
    assert(f.n_frames == 5, s"must count movi chunks, got ${f.n_frames}")
    assert(f.duration_ms == 40000L * 5 / 1000, "duration = frame timing × real frames")
    // frame sampling addresses REAL per-frame payloads
    val v = Multimodal.HeaderDecoder.aviVideo(avi).get
    Multimodal.sampleFrames(f, 2).foreach { i =>
      val img = Multimodal.PixelOps.decode(v.frameBytes(avi, i))
      assert(img.isDefined && img.get.getWidth == 48, s"frame $i must be a decodable JPEG")
    }
    // corrupt/truncated containers fall back to the stub, never guess
    val stub = Multimodal.StubDecoder.decodeBatch(Seq(MediaRecord(2L, "video", avi.take(40)))).head
    assert(Multimodal.HeaderDecoder.decodeBatch(
      Seq(MediaRecord(2L, "video", avi.take(40)))).head == stub)
    val prose = "RIFF-shaped prose that is not an AVI".getBytes("UTF-8")
    assert(Multimodal.HeaderDecoder.decodeBatch(Seq(MediaRecord(3L, "video", prose))).head ==
      Multimodal.StubDecoder.decodeBatch(Seq(MediaRecord(3L, "video", prose))).head)
  }

  test("PixelDecoder: video content features from real decoded MJPEG frames") {
    // solid gray frames are JPEG-stable; two shades average to their mean
    val frames = Seq(0x808080, 0x808080, 0x404040, 0x404040).map(realImage(32, 32, _, "jpg"))
    val avi = aviBytes(frames, 32, 32)
    val f = Multimodal.PixelDecoder.decodeBatch(Seq(MediaRecord(1L, "video", avi))).head
    assert(f.n_frames == 4 && f.width == 32)
    val expected = (0x80 + 0x80 + 0x40 + 0x40) / 4.0 / 255.0
    Seq(f.f0, f.f1, f.f2, f.f3).foreach(v =>
      assert(math.abs(v - expected) < 0.02, s"mean over frames: got $v want ~$expected"))
    // non-AVI video payloads keep the stub features
    val junk = Array.fill(250)(7.toByte)
    assert(Multimodal.PixelDecoder.decodeBatch(Seq(MediaRecord(2L, "video", junk))).head ==
      Multimodal.StubDecoder.decodeBatch(Seq(MediaRecord(2L, "video", junk))).head)
  }

  test("binaryFile ingestion: real .avi file -> content-true frame count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_avi_")
    val frames = Seq.fill(6)(realImage(24, 16, 0x606060, "jpg"))
    java.nio.file.Files.write(dir.resolve("clip.avi"), aviBytes(frames, 24, 16))
    val recs = graft.sources.MediaFiles.records(
      graft.sources.MediaFiles.read(spark, dir.toString))
    val f = Multimodal.extractFeatures(recs, Multimodal.HeaderDecoder).collect().head
    assert(f.kind == "video" && f.n_frames == 6 && f.width == 24 && f.height == 16)
  }

  test("frame-sample stub: every nth index, bounded by frame count") {
    val v = Multimodal.MediaFeatures(3L, "video", 10L, 1, 1, 10, 0, 0, 0, 0, 0, 0L)
    assert(Multimodal.sampleFrames(v, 3) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrames(v.copy(n_frames = 1), 5) == Seq(0))
  }

  test("binaryFile ingestion: directory of real files -> glob-pruned records -> header-true features") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_")
    def write(name: String, bytes: Array[Byte]) =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    write("a.png", pngBytes(640, 480))
    write("b.jpg", jpegBytes(333, 77))
    write("c.mp4", Array.fill(250)(7.toByte))
    write("d.wav", wavBytes(channels = 1, rate = 16000, bits = 16, dataBytes = 8000))
    write("notes.txt", "not media".getBytes("UTF-8"))   // excluded by glob
    write("_tmp.png.crc", Array[Byte](1, 2))            // excluded by glob

    val files = graft.sources.MediaFiles.read(spark, dir.toString)
    assert(files.count() == 4, "glob should prune non-media at LISTING time")
    // metadata predicates gate which files are read, not just rows
    assert(files.filter(col("length") > 100).count() == 2)

    val recs = graft.sources.MediaFiles.records(files)
    val feats = Multimodal.extractFeatures(recs, Multimodal.HeaderDecoder)
      .collect().map(f => f.kind -> f).toMap
    assert(feats.keySet == Set("image", "audio", "video"))
    // real WAV container values through the file route
    assert(feats("audio").sample_rate == 16000 && feats("audio").duration_ms == 250)
    // real container dimensions, not stub pseudo-dims
    val dims = Multimodal.extractFeatures(recs.filter(col("kind") === "image"),
        Multimodal.HeaderDecoder).collect().map(f => (f.width, f.height)).toSet
    assert(dims == Set((640, 480), (333, 77)))
    // video payload takes the stub frame count (1 per started 100 bytes)
    assert(feats("video").n_frames == 3)
    // ids are path-hash stable: re-reading yields the same id set
    val again = graft.sources.MediaFiles.records(
      graft.sources.MediaFiles.read(spark, dir.toString))
    assert(recs.select("media_id").collect().map(_.getLong(0)).toSet ==
      again.select("media_id").collect().map(_.getLong(0)).toSet)
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
