package graft

import graft.streaming.DedupStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Ingestion-time streaming dedup: batch 2 finds its duplicates against
  * batch 1's PERSISTED band state without re-pairing batch 1 — the
  * incremental contract end to end, across two real triggers. */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docJson(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""

  test("cross-batch dups verified against band state; within-old pairs not re-emitted") {
    val base = Files.createTempDirectory("graft_dedupstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = DedupStream.start(spark, bronze, schema, s"$base/archive", s"$base/corpus",
        s"$base/state", s"$base/pairs", s"$base/ckpt")
      assert(q.awaitTermination(120000))
    }

    // batch 1: an internal dup pair (1,2) + two docs that stay unique for now
    Files.write(java.nio.file.Paths.get(bronze, "b1.json"), Seq(
      docJson(1, "alpha beta gamma delta epsilon zeta eta"),
      docJson(2, "alpha beta gamma delta epsilon zeta eta"),
      docJson(3, "one two three four five six seven eight"),
      docJson(4, "totally unrelated words in this document")).mkString("\n").getBytes)
    run()

    def pairs(dir: String): Set[(Long, Long)] =
      spark.read.parquet(dir).select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(s"$base/pairs/batch_0") == Set((1L, 2L)))

    // batch 2: a dup of OLD doc 3, an internal dup pair (12,13), one unique
    Files.write(java.nio.file.Paths.get(bronze, "b2.json"), Seq(
      docJson(11, "one two three four five six seven eight"),
      docJson(12, "red orange yellow green blue indigo violet"),
      docJson(13, "red orange yellow green blue indigo violet"),
      docJson(14, "nothing shared with anything seen before")).mkString("\n").getBytes)
    run()

    val p1 = pairs(s"$base/pairs/batch_1")
    // cross-batch dup found via the state probe; batch-internal dup found;
    // batch 1's own pair NOT re-emitted (old x old never pairs)
    assert(p1 == Set((3L, 11L), (12L, 13L)), s"batch_1 pairs: $p1")

    // band state covers every ingested doc (k/bandWidth = 4 bands each)
    val stateIds = spark.read.parquet(s"$base/state/*")
      .groupBy("id").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stateIds.keySet == Set(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L))
    assert(stateIds.values.forall(_ == 4L))

    // corpus store holds all text, per-batch
    assert(spark.read.parquet(s"$base/corpus/*").count() == 8)

    // CRASH REPLAY: a crash between the state write and the checkpoint
    // commit leaves the replaying batch's OWN bands in the state dir.
    // Plant exactly that (batch 2's bands under state/batch_2) before
    // batch 2 runs: the replay guard must exclude them, or every doc
    // would self-pair at jaccard 1.0.
    import org.apache.spark.sql.functions.col
    val b3 = Seq(
      docJson(21, "completely fresh content for the third batch"),
      docJson(22, "another unique line of text right here"))
    val preDocs = {
      import spark.implicits._
      Seq((21L, "completely fresh content for the third batch"),
        (22L, "another unique line of text right here")).toDF("doc_id", "text")
    }
    graft.operators.Dedup.lshBands(
      graft.operators.Dedup.minhashSignatureArr(preDocs, col("doc_id"), col("text"), 3, 8), 8, 2)
      .write.mode("overwrite").parquet(s"$base/state/batch_2")
    Files.write(java.nio.file.Paths.get(bronze, "b3.json"), b3.mkString("\n").getBytes)
    run()
    val p2 = pairs(s"$base/pairs/batch_2")
    assert(p2.forall { case (a, b) => a != b }, s"self-pairs leaked on replay: $p2")
    assert(p2.isEmpty, s"batch 3 has no dups anywhere, got: $p2")
  }
}
