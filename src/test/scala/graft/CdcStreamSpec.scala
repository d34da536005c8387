package graft

import graft.operators.SnapshotDiff
import graft.streaming.CdcStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Continuous snapshot-diff over real triggers: each arriving file is a
  * full table dump; the change feed diffs it against the persisted
  * digest state of the previous generation. */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def rowJson(k: Long, v: String) = s"""{"k":$k,"v":"$v"}"""

  test("change feed across generations; crash-replay diffs against the pre-crash state") {
    val base = Files.createTempDirectory("graft_cdcstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = CdcStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/changes", s"$base/ckpt",
        keys = Seq("k"), digestOf = df => SnapshotDiff.rowDigest(Seq(df("v"))))
      assert(q.awaitTermination(120000))
    }
    def changes(dir: String): Set[(Long, String)] =
      spark.read.parquet(dir).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet

    // generation 1: keys 1..4
    Files.write(java.nio.file.Paths.get(bronze, "snap1.json"),
      Seq(rowJson(1, "a"), rowJson(2, "b"), rowJson(3, "c"), rowJson(4, "d"))
        .mkString("\n").getBytes)
    run()
    assert(changes(s"$base/changes/batch_0") ==
      Set((1L, "added"), (2L, "added"), (3L, "added"), (4L, "added")))

    // generation 2: k2 modified, k3 deleted, k5 added, k1/k4 unchanged
    Files.write(java.nio.file.Paths.get(bronze, "snap2.json"),
      Seq(rowJson(1, "a"), rowJson(2, "B!"), rowJson(4, "d"), rowJson(5, "e"))
        .mkString("\n").getBytes)
    run()
    assert(changes(s"$base/changes/batch_1") ==
      Set((2L, "changed"), (3L, "removed"), (5L, "added")))

    // CRASH REPLAY: a crash after batch 2's state write but before the
    // checkpoint commit leaves state/batch_2 on disk; the replay must
    // diff generation 3 against batch_1, NOT against the half-committed
    // batch_2 — plant a poisoned batch_2 state and verify it is ignored
    import spark.implicits._
    Seq((99L, "poison")).toDF("k", "v")
      .select(org.apache.spark.sql.functions.col("k"),
        SnapshotDiff.rowDigest(Seq(org.apache.spark.sql.functions.col("v"))).as("digest"))
      .write.parquet(s"$base/state/batch_2")
    // generation 3 = generation 2 with k1 deleted
    Files.write(java.nio.file.Paths.get(bronze, "snap3.json"),
      Seq(rowJson(2, "B!"), rowJson(4, "d"), rowJson(5, "e"))
        .mkString("\n").getBytes)
    run()
    assert(changes(s"$base/changes/batch_2") == Set((1L, "removed")),
      "replay diffed against the half-committed state instead of the prior generation")
    // and the replayed batch REPLACED the poisoned state with its own
    val state2 = spark.read.parquet(s"$base/state/batch_2")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(state2 == Set(2L, 4L, 5L))
    // retention: only the prior (batch_1) and current (batch_2) digest
    // tables survive — batch_0 was pruned after batch_2 committed
    val stateDirs = new java.io.File(s"$base/state").listFiles()
      .map(_.getName).filter(_.startsWith("batch_")).toSet
    assert(stateDirs == Set("batch_1", "batch_2"), s"state dirs: $stateDirs")
  }

  test("a dump exported as multiple part files fails the stream, not diffed piecewise") {
    val base = Files.createTempDirectory("graft_cdcsplit_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def start() = CdcStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/changes", s"$base/ckpt",
      keys = Seq("k"), digestOf = df => SnapshotDiff.rowDigest(Seq(df("v"))))
    // generation 1: a well-formed single-file dump
    Files.write(java.nio.file.Paths.get(bronze, "snap1.json"),
      Seq(rowJson(1, "a"), rowJson(2, "b")).mkString("\n").getBytes)
    val q1 = start()
    assert(q1.awaitTermination(120000))
    // generation 2 arrives SPLIT in two part files — with one file per
    // trigger each piece would otherwise be diffed as a full snapshot,
    // emitting a bogus removal of every row in the other piece
    Files.write(java.nio.file.Paths.get(bronze, "dump7-part-001.json"),
      Seq(rowJson(1, "a")).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(bronze, "dump7-part-002.json"),
      Seq(rowJson(3, "c")).mkString("\n").getBytes)
    new java.io.File(bronze, "snap1.json")
      .setLastModified(System.currentTimeMillis() - 120000)
    new java.io.File(bronze, "dump7-part-001.json")
      .setLastModified(System.currentTimeMillis() - 60000)
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q2.awaitTermination(120000))
    val messages = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("multiple files"), s"unexpected failure: $messages")
  }

  test("two dumps queued before one start become two generations, never one merged batch") {
    val base = Files.createTempDirectory("graft_cdcqueue_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    // both generations pending when the stream starts: a key present in
    // both with different values would corrupt the diff if they merged
    Files.write(java.nio.file.Paths.get(bronze, "snap1.json"),
      Seq(rowJson(1, "a"), rowJson(2, "b")).mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(bronze, "snap2.json"),
      Seq(rowJson(1, "A!"), rowJson(3, "c")).mkString("\n").getBytes)
    // unambiguous arrival order even on coarse-mtime filesystems
    new java.io.File(bronze, "snap1.json")
      .setLastModified(System.currentTimeMillis() - 60000)
    val q = CdcStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/changes", s"$base/ckpt",
      keys = Seq("k"), digestOf = df => SnapshotDiff.rowDigest(Seq(df("v"))))
    assert(q.awaitTermination(120000))
    def changes(dir: String): Set[(Long, String)] =
      spark.read.parquet(dir).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet
    assert(changes(s"$base/changes/batch_0") == Set((1L, "added"), (2L, "added")))
    assert(changes(s"$base/changes/batch_1") ==
      Set((1L, "changed"), (2L, "removed"), (3L, "added")))
  }
}
