package graft

import graft.streaming.{AnnStream, FileQueue}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming embedding-ANN index: batch N's near-neighbors are found
  * against the PERSISTED band index without re-reading old vectors
  * (old×old never re-pairs), the band width is frozen at stream start,
  * state compaction bounds the live generations while compacted bands
  * still probe, and the crash-replay guard keeps a batch from matching
  * its own planted state (which would emit cosine-1 self-pairs). */
class AnnStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 4
  private val schema = StructType(Seq(
    StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))

  private def axis(a: Int): Seq[Float] =
    (0 until Dim).map(i => if (i == a) 1.0f else 0.0f)
  private def rec(id: Long, v: Seq[Float]) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""

  test("cross-batch neighbors via persisted band state; compaction; crash-replay guard; parity") {
    val base = Files.createTempDirectory("graft_annstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = AnnStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        dim = Dim, bands = 4, minWidth = 4, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    // identical vectors co-bucket in every band and score cosine 1;
    // random band collisions between distinct vectors are possible, so
    // assertions read only the high-cosine rows
    def near(b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$base/pairs/batch_$b").filter(col("cos") >= 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 0: two e0 copies (internal pair) + one e1
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, axis(0)), rec(2, axis(1)), rec(3, axis(0))).mkString("\n").getBytes)
    run()
    assert(near(0) == Set((1L, 3L)))

    // batch 1: an e1 copy — found through the state probe only
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, axis(1))).mkString("\n").getBytes)
    run()
    assert(near(1) == Set((2L, 11L)))

    // parity: batch 1's FULL written rows == incrementalBandedPairs
    // offline over the same state generation (width from the stamp)
    val width = spark.read.parquet(s"$base/state/meta").head().getInt(1)
    val state0 = spark.read.parquet(s"$base/state/bands/batch_0")
    val vecs0 = spark.read.parquet(s"$base/state/vecs/batch_0")
    val new1 = Similarity.prep(
      Seq((11L, axis(1))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      col("vec_id"), col("embedding"))
    val offline = Similarity.incrementalBandedPairs(new1, vecs0, state0, Dim, 4, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val written = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(offline == written)

    // batch 2: another e0 — pairs to BOTH old e0s; 3rd live generation
    // triggers compaction of bands AND vecs
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, axis(0))).mkString("\n").getBytes)
    run()
    assert(near(2) == Set((1L, 21L), (3L, 21L)))
    assert(new java.io.File(s"$base/state/bands/batch_2/_FULL").exists())
    assert(new java.io.File(s"$base/state/vecs/batch_2/_FULL").exists())

    // CRASH REPLAY: plant batch 3's own bands/vecs under state (the
    // crash-between-state-write-and-commit window), then ingest batch 3.
    // The guard excludes its own generation: no cosine-1 self-pairs, and
    // its neighbors come out exactly as if the crash never happened.
    val pre = Similarity.prep(
      Seq((31L, axis(1)), (32L, axis(1))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      col("vec_id"), col("embedding"))
    Similarity.bandAssignments(pre, Dim, 4, width)
      .write.mode("overwrite").parquet(s"$base/state/bands/batch_3")
    pre.write.mode("overwrite").parquet(s"$base/state/vecs/batch_3")
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, axis(1)), rec(32, axis(1))).mkString("\n").getBytes)
    run()
    val p3 = spark.read.parquet(s"$base/pairs/batch_3")
    assert(p3.filter(col("vec_a") === col("vec_b")).isEmpty,
      "crash-replay guard failed: a batch matched its own planted state")
    assert(near(3) == Set((2L, 31L), (11L, 31L), (2L, 32L), (11L, 32L), (31L, 32L)))

    // dead deltas pruned: only the FULL generation + later dirs remain
    val gens = FileQueue.batchDirs(spark, s"$base/state/bands").map(_._1).toSet
    assert(gens == Set(2L, 3L), s"live band generations: $gens")
  }
}
