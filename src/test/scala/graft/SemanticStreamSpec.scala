package graft

import graft.streaming.{FileQueue, SemanticStream}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming semantic (cell-metric) near-dup detection: batch N's
  * within-cell neighbors are found against the PERSISTED cell index
  * without re-reading old vectors (old×old never re-pairs), centroids
  * freeze at stream start, compaction bounds live generations, and the
  * crash-replay guard keeps a batch from matching its own planted
  * state (which would emit cosine-1 self-pairs). */
class SemanticStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 4
  private val schema = StructType(Seq(
    StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))

  private def axis(a: Int): Seq[Float] =
    (0 until Dim).map(i => if (i == a) 1.0f else 0.0f)
  private def rec(id: Long, v: Seq[Float]) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""

  test("cross-batch cell neighbors via persisted state; frozen centroids; compaction; crash guard") {
    val base = Files.createTempDirectory("graft_semstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = SemanticStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        dim = Dim, threshold = 0.9, stride = 2, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def near(b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$base/pairs/batch_$b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch 0: centroids freeze to the even ids (0: e0, 2: e1); the
    // two e0 copies pair within cell 0, the two e1 copies within cell 2
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(0, axis(0)), rec(1, axis(0)), rec(2, axis(1)), rec(5, axis(1)))
      .mkString("\n").getBytes)
    run()
    assert(near(0) == Set((0L, 1L), (2L, 5L)))

    // batch 1: an e1 copy — found through the state probe only
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, axis(1))).mkString("\n").getBytes)
    run()
    assert(near(1) == Set((2L, 11L), (5L, 11L)))

    // parity: batch 1's FULL written rows == incrementalSemanticPairs
    // offline over the same state generation and frozen model
    val model = spark.read.parquet(s"$base/state/centroids")
      .select("cent_id", "cq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val state0 = spark.read.parquet(s"$base/state/cells/batch_0")
    val new1 = Similarity.prep(
      Seq((11L, axis(1))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      col("vec_id"), col("embedding"))
    val offline = Similarity.incrementalSemanticPairs(new1, state0, model, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val written = spark.read.parquet(s"$base/pairs/batch_1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(offline == written)

    // batch 2: another e0 — pairs to both old e0s; 3rd generation folds
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, axis(0))).mkString("\n").getBytes)
    run()
    assert(near(2) == Set((0L, 21L), (1L, 21L)))
    assert(new java.io.File(s"$base/state/cells/batch_2/_FULL").exists())

    // CRASH REPLAY: plant batch 3's own cells under state, then ingest
    // batch 3 — the guard excludes its own generation: no cosine-1
    // self-pairs, neighbors exactly as if the crash never happened
    val pre = Similarity.prep(
      Seq((31L, axis(1)), (32L, axis(1))).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      col("vec_id"), col("embedding"))
    pre.withColumn("cell", Similarity.cellAssignExpr(model, col("q"), col("norm")))
      .write.mode("overwrite").parquet(s"$base/state/cells/batch_3")
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, axis(1)), rec(32, axis(1))).mkString("\n").getBytes)
    run()
    val p3 = spark.read.parquet(s"$base/pairs/batch_3")
    assert(p3.filter(col("vec_a") === col("vec_b")).isEmpty,
      "crash-replay guard failed: a batch matched its own planted state")
    assert(near(3) == Set((2L, 31L), (5L, 31L), (11L, 31L),
      (2L, 32L), (5L, 32L), (11L, 32L), (31L, 32L)))

    // mismatched params fail loudly instead of silently missing pairs
    Files.write(java.nio.file.Paths.get(bronze, "f4.json"), Seq(
      rec(41, axis(0))).mkString("\n").getBytes)
    val bad = SemanticStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pairs", s"$base/ckpt",
      dim = Dim, threshold = 0.5, stride = 2, compactEvery = 3)
    val err = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    assert(err.getMessage != null)

    val gens = FileQueue.batchDirs(spark, s"$base/state/cells").map(_._1).toSet
    assert(gens == Set(2L, 3L), s"live cell generations: $gens")
  }
}
