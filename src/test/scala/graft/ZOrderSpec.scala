package graft

import graft.functions.ZOrder
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering: the interleave must be bit-exact against a
  * first-principles reference, and the layout must measurably shrink
  * per-file footprints in BOTH dimensions — the property parquet
  * min/max skipping depends on. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Bit-at-a-time reference: bit i of x → bit 2i, bit i of y → 2i+1. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the bit-at-a-time reference on edge and random values") {
    val rng = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (Int.MaxValue.toLong, 0L),
      (0L, Int.MaxValue.toLong), (Int.MaxValue.toLong, Int.MaxValue.toLong)) ++
      Seq.fill(100)((rng.nextInt(Int.MaxValue).toLong, rng.nextInt(Int.MaxValue).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"interleave($x, $y) = $z, want ${mortonRef(x, y)}")
      assert(z >= 0, s"sign bit set for in-domain input ($x, $y)")
    }
  }

  test("out-of-domain coordinates fail loudly; nulls pass through as null keys") {
    val neg = intercept[Exception] {
      Seq((-1L, 2L)).toDF("x", "y")
        .select(ZOrder.interleave(col("x"), col("y"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(neg).exists(m => m != null && m.contains("outside [0, 2^31)")), msgs(neg))
    val wide = intercept[Exception] {
      Seq((1L << 31, 2L)).toDF("x", "y")
        .select(ZOrder.interleave(col("x"), col("y"))).collect()
    }
    assert(msgs(wide).exists(m => m != null && m.contains("outside [0, 2^31)")), msgs(wide))
    val nulls = Seq((Some(3L), None: Option[Long])).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("writeZOrdered rejects a frame already carrying __z") {
    intercept[IllegalArgumentException] {
      Sinks.writeZOrdered(Seq((1, 2, 3L)).toDF("x", "y", "__z"),
        "/tmp/never_written", col("x"), col("y"), files = 1)
    }
  }

  test("z-ordered files cover small rectangles in BOTH dims; single-column clustering does not") {
    // a 64x64 grid of points; 16 output files
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y").repartition(8)
    val zdir = java.nio.file.Files.createTempDirectory("graft_z_").toString
    val cdir = java.nio.file.Files.createTempDirectory("graft_c_").toString
    Sinks.writeZOrdered(grid, zdir, col("x"), col("y"), files = 16)
    Sinks.writeClustered(grid, cdir, Seq("x"), files = 16)

    // per-FILE footprint via the file-name virtual column — one pass,
    // no per-file re-reads
    def footprints(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .select(col("xr").cast("long"), col("yr").cast("long"))
        .as[(Long, Long)].collect()

    val z = footprints(zdir)
    val c = footprints(cdir)
    assert(z.length == 16 && c.length == 16)
    // single-column clustering: x footprint tiny, y footprint = FULL range
    assert(c.forall(_._2 == 63), s"x-clustered y ranges: ${c.map(_._2).toSeq}")
    // z-order: EVERY file's footprint is a fraction of the 63-wide range
    // on BOTH dims (ideal 16-file z-layout = 16x16 rectangles)
    z.foreach { case (xr, yr) =>
      assert(xr <= 31 && yr <= 31, s"file footprint not rectangular: x=$xr y=$yr")
    }
  }
}
