package graft

import graft.operators.{PrefixSum, ShardManifest}
import graft.streaming.PackStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming sequence packer: offsets continue seamlessly across
  * batches through the persisted ledger (the loader sees ONE packed
  * corpus), per-batch manifest deltas fold into exactly the manifest
  * of the equivalent single-pass batch pack — including a bin that
  * STRADDLES two batches — null-unit rows route to rejects, a crash
  * replay never double-advances the offset, and a drifted budget
  * fails loudly. */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_units", LongType)))

  private val Budget = 10L

  private def rec(id: Long, units: java.lang.Long): String =
    s"""{"doc_id":$id,"n_units":$units}"""

  test("cross-batch offsets; manifest deltas fold to the batch pack; rejects; crash guard; drift fails loudly") {
    val base = Files.createTempDirectory("graft_packstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(budget: Long = Budget): Unit = {
      val q = PackStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/shards", s"$base/manifest", s"$base/rejects",
        s"$base/ckpt", budget, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def shard(b: Int): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$base/shards/batch_$b")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

    // batch 0: units 4, 5, 7 → ends 4, 9, 16; doc 3 STARTS at 9 (bin
    // 0) and straddles into bin 1 — the concat-then-slice contract; a
    // null-unit row routes to rejects, not into the stream
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, 4L), rec(2, 5L), rec(3, 7L), rec(9, null)).mkString("\n").getBytes)
    run()
    assert(shard(0) == Map(1L -> (4L, 0L), 2L -> (9L, 0L), 3L -> (16L, 0L)))
    val r0 = spark.read.parquet(s"$base/rejects/batch_0")
      .select("doc_id", "reason").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(r0 == Set((9L, "null_units")))

    // batch 1: the ledger carries 16 — doc 4 starts at 16 (bin 1),
    // doc 5 at 18 (bin 1), end 27: offsets continued, not restarted
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(4, 2L), rec(5, 9L)).mkString("\n").getBytes)
    run()
    assert(shard(1) == Map(4L -> (18L, 1L), 5L -> (27L, 1L)))

    // the folded manifest equals the SINGLE-PASS batch pack of the
    // whole arrival stream (ordered by batch, then doc_id) — bin 1
    // straddles both batches and must merge into one exact row
    val offline = PrefixSum.packByBudget(
      Seq((0L, 1L, 4L), (0L, 2L, 5L), (0L, 3L, 7L), (1L, 4L, 2L), (1L, 5L, 9L))
        .toDF("b", "doc_id", "n_units"),
      Seq(col("b"), col("doc_id")), col("n_units"), Budget, "bin",
      tieBreaker = Some(col("doc_id")))
    val expected = ShardManifest.build(offline, col("bin"), col("doc_id"),
        col("n_units"), Budget)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val merged = PackStream.mergedManifest(spark, s"$base/manifest")
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(merged == expected, s"merged=$merged expected=$expected")

    // crash guard: plant a fake generation under the NEXT batch id —
    // the replaying batch must ignore its own generation (base stays
    // 27, not 27 + 999) and overwrite the planted delta with its real one
    Seq(999L).toDF("units")
      .write.mode("overwrite").parquet(s"$base/state/offset/batch_2")
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(6, 3L)).mkString("\n").getBytes)
    run()
    assert(shard(2) == Map(6L -> (30L, 2L)))
    // batch 2 hits the compaction threshold (compactEvery = 3), so its
    // real generation is the FOLDED total 30, not the 3-unit delta —
    // and certainly not the planted 999
    val g2 = spark.read.parquet(s"$base/state/offset/batch_2")
      .collect().map(_.getLong(0)).toSeq
    assert(g2 == Seq(30L), s"planted generation survived: $g2")

    // COMPACTION RE-MANIFEST: the compaction batch's manifest
    // generation is the FOLDED manifest of the whole stream so far
    // (marked _FULL), byte-equal to the single-pass manifest — a
    // loader reads one manifest + tail deltas, never the history
    assert(new java.io.File(s"$base/manifest/batch_2/_FULL").exists(),
      "compaction batch did not mark its re-manifest _FULL")
    def singlePass(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] =
      ShardManifest.build(
        PrefixSum.packByBudget(rows.toDF("b", "doc_id", "n_units"),
          Seq(col("b"), col("doc_id")), col("n_units"), Budget, "bin",
          tieBreaker = Some(col("doc_id"))),
        col("bin"), col("doc_id"), col("n_units"), Budget)
        .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    def mergedSet(): Set[(Long, Long, Long, Long)] =
      PackStream.mergedManifest(spark, s"$base/manifest")
        .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val all2 = Seq((0L, 1L, 4L), (0L, 2L, 5L), (0L, 3L, 7L),
      (1L, 4L, 2L), (1L, 5L, 9L), (2L, 6L, 3L))
    assert(spark.read.parquet(s"$base/manifest/batch_2")
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      == singlePass(all2), "the re-manifest is not the exact single-pass manifest")
    assert(mergedSet() == singlePass(all2))

    // the NEXT batch prunes the superseded deltas (below the _FULL
    // marker) and the fold becomes full + tail delta — still exact
    Files.write(java.nio.file.Paths.get(bronze, "f2b.json"), Seq(
      rec(8, 4L)).mkString("\n").getBytes)
    run()
    assert(!new java.io.File(s"$base/manifest/batch_0").exists() &&
      !new java.io.File(s"$base/manifest/batch_1").exists(),
      "superseded manifest deltas survived the re-manifest")
    assert(mergedSet() == singlePass(all2 :+ (3L, 8L, 4L)))

    // a drifted budget fails loudly with the frozen-vs-probed values
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(7, 1L)).mkString("\n").getBytes)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val bad = PackStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/shards", s"$base/manifest", s"$base/rejects",
      s"$base/ckpt", Budget * 2, compactEvery = 3)
    val e = intercept[Exception] { bad.awaitTermination(120000); bad.processAllAvailable() }
    assert(msgs(e).exists(m => m.contains("budget=" + Budget * 2) && m.contains("frozen")),
      s"unexpected failure: ${msgs(e)}")
  }
}
