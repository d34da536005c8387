package graft

import graft.streaming.FuzzyStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming fuzzy entity matching: batch 2's typo pairs are found
  * against batch 1's PERSISTED prefix-gram index without re-reading
  * batch 1, the frequency order is frozen at stream start (shared total
  * order across epochs — the prefix lemma's exactness condition), and
  * state compaction bounds the live generations while compacted grams
  * still probe. */
class FuzzyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def rec(id: Long, name: String) = s"""{"id":$id,"name":"$name"}"""

  test("cross-batch typo pairs via persisted gram state; compaction keeps probing") {
    val base = Files.createTempDirectory("graft_fuzzystream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = FuzzyStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pairs", s"$base/ckpt",
        maxDist = 1, q = 2, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def pairs(b: Int): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$base/pairs/batch_$b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // batch 0: the master records; one internal near-pair
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, "lavender spring"), rec(2, "completely different"),
      rec(3, "lavender sprint")).mkString("\n").getBytes)
    run()
    assert(pairs(0) == Set((1L, 3L, 1L)))

    // batch 1: typo of batch 0's names — found through the state probe
    // only (old docs are never re-read)
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, "lavender sprigg"), rec(12, "nothing alike here")).mkString("\n").getBytes)
    run()
    // "sprigg": 1 edit from "spring", 2 from "sprint"
    assert(pairs(1) == Set((1L, 11L, 1L)))

    // batch 2: exact duplicate of an old name → dist-0 pairs to every
    // old within-1 neighbor; triggers compaction (3rd live generation)
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, "lavender spring")).mkString("\n").getBytes)
    run()
    assert(pairs(2) == Set((1L, 21L, 0L), (3L, 21L, 1L), (11L, 21L, 1L)))
    assert(new java.io.File(s"$base/state/grams/batch_2/_FULL").exists())

    // batch 3: prunes the dead deltas, then matches through the FULL
    // generation alone — batch 0/1 grams must have survived the fold
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, "lavender sprina")).mkString("\n").getBytes)
    run()
    // "sprina": 1 edit from "spring"(×2) and "sprint"; 2 from "sprigg"
    assert(pairs(3) == Set((1L, 31L, 1L), (3L, 31L, 1L), (21L, 31L, 1L)))
    val dirs = graft.streaming.FileQueue.batchDirs(spark, s"$base/state/grams")
      .map(_._1).toSet
    assert(dirs == Set(2L, 3L), s"live generations: $dirs")
  }
}
