package graft

import graft.streaming.{DomainCapStream, FileQueue}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming domain-quota admission: per-domain caps are enforced
  * ACROSS batches through the persisted admitted-count ledger,
  * blocklisted domains route to overflow with their reason, the
  * within-batch draw is the deterministic md5 order, a crash replay
  * never double-counts its own admissions, and a drifted cap or
  * blocklist fails loudly. */
class DomainCapStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType)))

  private def rec(id: Long, src: String): String =
    s"""{"doc_id":$id,"source":"$src"}"""

  test("caps across batches; blocklist; md5 draw; crash guard; drift fails loudly") {
    val base = Files.createTempDirectory("graft_domaincap_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(cap: Long = 3, block: Seq[String] = Seq("bad")): Unit = {
      val q = DomainCapStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/admit", s"$base/overflow", s"$base/ckpt",
        cap = cap, blocklist = block, compactEvery = 3)
      assert(q.awaitTermination(120000))
    }
    def ids(dir: String, b: Int): Set[Long] =
      spark.read.parquet(s"$base/$dir/batch_$b")
        .select("doc_id").collect().map(_.getLong(0)).toSet

    // batch 0: domain a has 2 docs (under cap 3), b has 1; a blocked
    // domain's doc overflows with reason "blocked"; a NULL-source doc
    // (no quota identity — it satisfies neither isin nor NOT isin)
    // must route to overflow with its own reason, not silently vanish
    // (ADVICE r14)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, "a"), rec(2, "a"), rec(3, "b"), rec(4, "bad"),
      """{"doc_id":5,"source":null}""").mkString("\n").getBytes)
    run()
    assert(ids("admit", 0) == Set(1L, 2L, 3L))
    val o0 = spark.read.parquet(s"$base/overflow/batch_0")
      .select("doc_id", "reason").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(o0 == Set((4L, "blocked"), (5L, "null_source")))

    // batch 1: THREE more domain-a docs against 1 remaining slot — the
    // md5 draw picks which one is admitted (deterministic, not arrival
    // order); domain b takes 2 more (exactly to its cap)
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, "a"), rec(12, "a"), rec(13, "a"),
      rec(14, "b"), rec(15, "b")).mkString("\n").getBytes)
    run()
    def h(id: Long): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      BigInt(1, d.take(4))
    }
    val expectA = Seq(11L, 12L, 13L).minBy(id => (h(id), id))
    assert(ids("admit", 1) == Set(expectA, 14L, 15L))
    assert(ids("overflow", 1) == Set(11L, 12L, 13L).diff(Set(expectA)))
    val reasons1 = spark.read.parquet(s"$base/overflow/batch_1")
      .select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons1 == Set("quota"))

    // batch 2: both domains are full — everything overflows; the 3rd
    // ledger generation folds to _FULL
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, "a"), rec(22, "b")).mkString("\n").getBytes)
    run()
    assert(ids("admit", 2).isEmpty)
    assert(ids("overflow", 2) == Set(21L, 22L))
    assert(new java.io.File(s"$base/state/counts/batch_2/_FULL").exists())

    // ledger total equals all admissions so far
    val (live, _) = FileQueue.liveGenerations(spark, s"$base/state/counts", 99L)
    val totals = spark.read.parquet(live: _*)
      .groupBy("source").agg(sum("n_admitted").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals == Map("a" -> 3L, "b" -> 3L))

    // CRASH REPLAY: plant batch 3's own ledger generation, then ingest
    // batch 3 — the guard excludes it, so the one remaining... none:
    // quotas are full, but the planted rows must NOT double-count into
    // the fold either
    import spark.implicits._
    Seq(("a", 99L)).toDF("source", "n_admitted")
      .write.mode("overwrite").parquet(s"$base/state/counts/batch_3")
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, "c")).mkString("\n").getBytes)
    run()
    // domain c is fresh: admitted despite the planted garbage (which
    // the replay overwrote with batch 3's real delta)
    assert(ids("admit", 3) == Set(31L))
    val g3 = spark.read.parquet(s"$base/state/counts/batch_3")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g3 == Map("c" -> 1L), s"planted generation survived: $g3")

    // drifted cap and drifted blocklist both fail loudly
    Files.write(java.nio.file.Paths.get(bronze, "f4.json"), Seq(
      rec(41, "d")).mkString("\n").getBytes)
    val badCap = DomainCapStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/admit", s"$base/overflow", s"$base/ckpt",
      cap = 4, blocklist = Seq("bad"), compactEvery = 3)
    // specifically the frozen-quota guard, not just any failure (ADVICE r14)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception] { badCap.awaitTermination(120000); badCap.processAllAvailable() }
    assert(msgs(e1).exists(m => m.contains("quotas frozen") && m.contains("cap=4")),
      s"unexpected failure: ${msgs(e1)}")
    val badBlock = DomainCapStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/admit", s"$base/overflow", s"$base/ckpt",
      cap = 3, blocklist = Seq("other"), compactEvery = 3)
    val e2 = intercept[Exception] { badBlock.awaitTermination(120000); badBlock.processAllAvailable() }
    assert(msgs(e2).exists(m => m.contains("quotas frozen") && m.contains("other")),
      s"unexpected failure: ${msgs(e2)}")
  }
}
