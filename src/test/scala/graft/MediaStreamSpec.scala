package graft

import graft.streaming.{FileQueue, MediaStream}
import graft.operators.{Dedup, Multimodal}
import graft.queries.MediaSynth
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.Base64

/** Streaming perceptual-hash media dedup: batch N's within-radius
  * neighbors are found against the PERSISTED signature state from REAL
  * base64 image payloads (ImageIO decode → pooled grid → dHash);
  * old×old never re-pairs, params freeze at stream start, compaction
  * bounds live generations, and the crash-replay guard keeps a batch
  * from matching its own planted state. */
class MediaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("media_id", LongType), StructField("media", StringType)))

  // deterministic planted pixel structures: a base pattern, brightness
  // shifts of it (dHash-identical — the perceptual invariance), and a
  // structurally distinct pattern
  private def pat1(x: Int, y: Int): Int = (x * 37 + y * 11) % 97 + 60
  private def pat2(x: Int, y: Int): Int = (x * 5 + y * 53) % 89 + 40
  private def png(f: (Int, Int) => Int): Array[Byte] = MediaSynth.pngBytes(36, 32, f)
  private def rec(id: Long, bytes: Array[Byte]): String =
    s"""{"media_id":$id,"media":"${Base64.getEncoder.encodeToString(bytes)}"}"""

  private def localSig(bytes: Array[Byte]): String = {
    val img = Multimodal.PixelOps.decode(bytes).get
    Multimodal.dhashLocal(Multimodal.PixelOps.grayGrid(img, 9, 8), 9, 8)
  }

  test("cross-batch Hamming neighbors via persisted signatures; frozen params; compaction; crash guard") {
    val base = Files.createTempDirectory("graft_mediastream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(maxDist: Int = 2): Unit = {
      val q = MediaStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        maxDist = maxDist, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def near(b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$base/pairs/batch_$b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val a = png(pat1); val aShift = png((x, y) => pat1(x, y) + 12)
    val distinct = png(pat2)
    // sanity on the planted geometry (real decoded pixels)
    assert(localSig(a) == localSig(aShift))
    assert(localSig(a).zip(localSig(distinct)).count { case (p, q) => p != q } > 2)

    // batch 0: the brightness pair matches in-batch; distinct stays out
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, a), rec(2, aShift), rec(3, distinct)).mkString("\n").getBytes)
    run()
    assert(near(0) == Set((1L, 2L)))

    // batch 1: another shift of pattern 1 — found through the STATE
    // probe only (no in-batch partner)
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, png((x, y) => pat1(x, y) + 25))).mkString("\n").getBytes)
    run()
    assert(near(1) == Set((1L, 11L), (2L, 11L)))

    // parity: batch 1's written pairs == incrementalSimhashPairs
    // offline over the same persisted generation
    val state0 = spark.read.parquet(s"$base/state/sigs/batch_0")
    val new1 = Seq((11L, localSig(png((x, y) => pat1(x, y) + 25)))).toDF("id", "simhash")
    val offline = Dedup.incrementalSimhashPairs(new1, state0, maxDist = 2, sigLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val written = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(offline == written && written.forall(_._3 == 0))

    // batch 2: a distinct-pattern shift pairs with id 3 via state; the
    // 3rd generation folds to _FULL
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, png((x, y) => pat2(x, y) + 9))).mkString("\n").getBytes)
    run()
    assert(near(2) == Set((3L, 21L)))
    assert(new java.io.File(s"$base/state/sigs/batch_2/_FULL").exists())

    // CRASH REPLAY: plant batch 3's own signatures under state, then
    // ingest batch 3 — the guard excludes its own generation: no
    // distance-0 self-pairs
    val pre = Seq((31L, localSig(a))).toDF("id", "simhash")
    pre.write.mode("overwrite").parquet(s"$base/state/sigs/batch_3")
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, a)).mkString("\n").getBytes)
    run()
    val p3 = spark.read.parquet(s"$base/pairs/batch_3")
    assert(p3.filter(col("id_a") === col("id_b")).isEmpty,
      "crash-replay guard failed: a batch matched its own planted state")
    assert(near(3) == Set((1L, 31L), (2L, 31L), (11L, 31L)))

    // mismatched params fail loudly instead of silently re-banding
    Files.write(java.nio.file.Paths.get(bronze, "f4.json"), Seq(
      rec(41, distinct)).mkString("\n").getBytes)
    val bad = MediaStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pairs", s"$base/ckpt", maxDist = 1, compactEvery = 3)
    val err = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    assert(err.getMessage != null)

    val gens = FileQueue.batchDirs(spark, s"$base/state/sigs").map(_._1).toSet
    assert(gens == Set(2L, 3L), s"live signature generations: $gens")
  }

  test("audio extractor: volume-scaled WAVs pair across batches through persisted state") {
    val base = Files.createTempDirectory("graft_audiostream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = MediaStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        maxDist = 2, extractor = graft.streaming.MediaStream.AudioWhtEnvelope(),
        compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    // planted PCM: a structured clip, its volume-scaled twin, a distinct clip
    def clip(f: Int => Int): Array[Byte] =
      MediaSynth.wavBytes(8000, Array.tabulate(4096)(i => f(i).toShort))
    def s1(i: Int) = ((i / 80) % 31 - 15) * 900
    def s2(i: Int) = ((i / 64) % 17 - 8) * 1100
    val a = clip(s1); val aLoud = clip(i => s1(i) * 2)
    val other = clip(s2)

    // batch 0: the volume pair matches in-batch (sign invariance on
    // REAL parsed PCM); the distinct clip stays out
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, a), rec(2, aLoud), rec(3, other)).mkString("\n").getBytes)
    run()
    val p0 = spark.read.parquet(s"$base/pairs/batch_0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p0 == Set((1L, 2L)))

    // batch 1: a third scaling — found through the STATE probe only
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, clip(i => s1(i) * 3 / 2))).mkString("\n").getBytes)
    run()
    val p1 = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((1L, 11L), (2L, 11L)))

    // an image-extractor restart against audio state fails loudly
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, other)).mkString("\n").getBytes)
    val bad = MediaStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pairs", s"$base/ckpt", maxDist = 2, compactEvery = 3)
    val err = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    assert(err.getMessage != null)
  }

  test("undecodable payload routes to rejects — never a poison pill") {
    val base = Files.createTempDirectory("graft_mediareject_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = MediaStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        maxDist = 2, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    // batch 0: two decodable near-dups plus one garbage payload — the
    // batch must COMMIT (pairs found, signatures persisted) with the
    // corrupt record routed, not thrown (crash replay re-reads the
    // same file: a throw here wedges the stream permanently)
    val garbage = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, png(pat1)), rec(2, garbage),
      rec(3, png((x, y) => pat1(x, y) + 12))).mkString("\n").getBytes)
    run()
    val p0 = spark.read.parquet(s"$base/pairs/batch_0")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p0 == Set((1L, 3L)))
    val rejected = spark.read.parquet(s"$base/state/rejects/batch_0")
      .collect().map(_.getLong(0)).toSet
    assert(rejected == Set(2L))
    // the reject never entered the signature state
    val sigs = spark.read.parquet(s"$base/state/sigs/batch_0")
      .collect().map(_.getLong(0)).toSet
    assert(sigs == Set(1L, 3L))
    // and the stream is NOT wedged: the next batch processes normally
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, png((x, y) => pat1(x, y) + 25))).mkString("\n").getBytes)
    run()
    val p1 = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1 == Set((1L, 11L), (3L, 11L)))
  }

  test("incremental == full simhashPairs restricted to batch-touching pairs") {
    // randomized signatures: the defining parity property under the
    // same banding, on both sides of the radius
    val rnd = new scala.util.Random(17)
    def sig(): String = {
      val bits = Array.fill(64)(if (rnd.nextBoolean()) '1' else '0')
      new String(bits)
    }
    def flip(s: String, k: Int): String = {
      val a = s.toCharArray
      rnd.shuffle((0 until 64).toList).take(k).foreach(i =>
        a(i) = if (a(i) == '0') '1' else '0')
      new String(a)
    }
    val bases = Seq.fill(12)(sig())
    val all = bases.zipWithIndex.flatMap { case (s, i) =>
      Seq((i * 10L, s), (i * 10L + 1, flip(s, rnd.nextInt(4)))) // dist 0..3
    }
    val df = all.toDF("id", "simhash")
    val isNew = pmod(col("id"), lit(10)) === 1
    val full = Dedup.simhashPairs(df, maxDist = 2, sigLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val incr = Dedup.incrementalSimhashPairs(
        df.filter(isNew), df.filter(!isNew), maxDist = 2, sigLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incr == full.filter { case (a, b, _) => a % 10 == 1 || b % 10 == 1 })
    assert(incr.nonEmpty)
  }
}
