package graft

import graft.operators.SnapshotDiff
import graft.streaming.MatViewStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The continuously-maintained view over real triggers: every snapshot
  * generation must leave the persisted view equal to a from-scratch
  * GROUP BY of that snapshot — through value changes, group moves,
  * group death, and a crash-replay with a poisoned newer state.
  */
class MatViewStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def rowJson(k: Long, g: String, v: Double) =
    s"""{"k":$k,"grp":"$g","v":$v}"""

  private def viewOf(dir: String): Set[(String, Long, BigDecimal)] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("cnt"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sv")))).toSet

  private def expect(rows: (Long, String, Double)*): Set[(String, Long, BigDecimal)] =
    rows.groupBy(_._2).map { case (g, rs) =>
      (g, rs.size.toLong, rs.map(r => BigDecimal(r._3).setScale(2)).sum)
    }.toSet

  test("view tracks every generation exactly; replay ignores poisoned state") {
    val base = Files.createTempDirectory("graft_mvstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def run(): Unit = {
      val q = MatViewStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/view", s"$base/ckpt",
        keys = Seq("k"),
        digestOf = df => SnapshotDiff.rowDigest(Seq(df("grp"), df("v").cast("decimal(18,2)"))),
        groups = Seq("grp" -> col("grp")),
        sums = Seq("sv" -> col("v").cast("decimal(18,2)")))
      assert(q.awaitTermination(120000))
    }

    // generation 1
    val g1 = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0), (4L, "c", 7.5))
    Files.write(java.nio.file.Paths.get(bronze, "snap1.json"),
      g1.map((rowJson _).tupled).mkString("\n").getBytes)
    run()
    assert(viewOf(s"$base/view/batch_0") == expect(g1: _*))

    // generation 2: k2 value change, k3 moves b->c (b dies), k4 removed,
    // k5 new group d
    val g2 = Seq((1L, "a", 10.0), (2L, "a", 25.0), (3L, "c", 5.0), (5L, "d", 1.25))
    Files.write(java.nio.file.Paths.get(bronze, "snap2.json"),
      g2.map((rowJson _).tupled).mkString("\n").getBytes)
    run()
    assert(viewOf(s"$base/view/batch_1") == expect(g2: _*))
    assert(!viewOf(s"$base/view/batch_1").exists(_._1 == "b"), "emptied group must die")

    // crash replay: plant poisoned state+view at batch_2; the replayed
    // batch must roll forward from batch_1 and overwrite the poison
    Seq((99L, "zz", 1.0)).toDF("k", "grp", "v")
      .select(col("k"), SnapshotDiff.rowDigest(Seq(col("grp"),
        col("v").cast("decimal(18,2)"))).as("digest"),
        col("grp"), col("v").cast("decimal(18,2)").as("sv"))
      .write.parquet(s"$base/state/batch_2")
    Seq(("zz", 1L, java.math.BigDecimal.ONE)).toDF("grp", "cnt", "sv")
      .write.parquet(s"$base/view/batch_2")
    val g3 = Seq((1L, "a", 10.0), (5L, "d", 2.5))
    Files.write(java.nio.file.Paths.get(bronze, "snap3.json"),
      g3.map((rowJson _).tupled).mkString("\n").getBytes)
    run()
    assert(viewOf(s"$base/view/batch_2") == expect(g3: _*),
      "replay must diff against the prior committed generation, not the poison")

    // retention: only prior + current generations survive in both dirs
    def dirs(d: String) = new java.io.File(d).listFiles()
      .map(_.getName).filter(_.startsWith("batch_")).toSet
    assert(dirs(s"$base/state") == Set("batch_1", "batch_2"))
    assert(dirs(s"$base/view") == Set("batch_1", "batch_2"))
    // and the convenience reader surfaces the latest view
    assert(MatViewStream.currentView(spark, s"$base/view").get
      .select("grp").as[String].collect().toSet == Set("a", "d"))
  }

  test("a dump split into part files fails the stream instead of corrupting the view") {
    val base = Files.createTempDirectory("graft_mvsplit_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    def start() = MatViewStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/view", s"$base/ckpt",
      keys = Seq("k"),
      digestOf = df => SnapshotDiff.rowDigest(Seq(df("grp"), df("v").cast("decimal(18,2)"))),
      groups = Seq("grp" -> col("grp")),
      sums = Seq("sv" -> col("v").cast("decimal(18,2)")))
    Files.write(java.nio.file.Paths.get(bronze, "snap1.json"),
      rowJson(1L, "a", 1.0).getBytes)
    val q1 = start(); assert(q1.awaitTermination(120000))
    // generation 2 split across two part files: piece 1 lands as a full
    // "snapshot" (k1 would read as removed), piece 2 must KILL the query
    Files.write(java.nio.file.Paths.get(bronze, "snap2-part-001.json"),
      rowJson(2L, "a", 2.0).getBytes)
    Files.write(java.nio.file.Paths.get(bronze, "snap2-part-002.json"),
      rowJson(3L, "b", 3.0).getBytes)
    val q2 = start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination(120000)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(failed).exists(_.contains("exported as multiple files")),
      s"expected the generation-integrity failure, got: ${rootMessages(failed)}")
  }
}
