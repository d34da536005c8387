package graft

import graft.streaming.DecontaminateStream
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming semantic eval-decontamination: every arriving vector is
  * scored map-side against the FROZEN eval set and split pass/drop;
  * the union over batches equals the batch screen
  * (q_decontaminate_embed semantics) over the union of inputs; a
  * restart with drifted params or a drifted eval set fails loudly. */
class DecontaminateStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 4
  private val Threshold = 0.9
  private val schema = StructType(Seq(
    StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))

  private def axis(a: Int): Seq[Float] =
    (0 until Dim).map(i => if (i == a) 1.0f else 0.0f)
  private def mix(a: Int, b: Int): Seq[Float] =
    (0 until Dim).map(i => if (i == a || i == b) 0.7071f else 0.0f)
  private def rec(id: Long, v: Seq[Float]) =
    s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""

  private def prepRefs(vs: Seq[(Long, Seq[Float])]): Seq[(Long, Seq[Long])] =
    Similarity.prep(vs.toDF("id", "v")
        .select(col("id"), col("v").cast("array<float>").as("v")), col("id"), col("v"))
      .select("id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq

  test("pass/drop split across batches; frozen model; batch-screen parity; drift fails loudly") {
    val base = Files.createTempDirectory("graft_decontstream_").toString
    val bronze = s"$base/bronze/new"
    new java.io.File(bronze).mkdirs()
    val refs = prepRefs(Seq(100L -> axis(0), 101L -> axis(1)))
    def run(refsArg: Seq[(Long, Seq[Long])] = refs, bar: Double = Threshold): Unit = {
      val q = DecontaminateStream.start(spark, bronze, schema, s"$base/archive",
        s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
        refsArg, Dim, bar)
      assert(q.awaitTermination(120000))
    }
    def ids(dir: String, b: Int): Set[Long] =
      spark.read.parquet(s"$base/$dir/batch_$b")
        .collect().map(_.getLong(0)).toSet

    // batch 0 freezes the screen: 1 sits ON an eval vector (drop), 2 is
    // orthogonal (pass), 3 is a diagonal ~0.707 from both (pass)
    Files.write(java.nio.file.Paths.get(bronze, "f0.json"), Seq(
      rec(1, axis(0)), rec(2, axis(2)), rec(3, mix(0, 1)))
      .mkString("\n").getBytes)
    run()
    assert(ids("drop", 0) == Set(1L))
    assert(ids("pass", 0) == Set(2L, 3L))

    // batch 1: screens against the FROZEN refs (no state growth —
    // stateless screen); 11 matches eval 101, 12 passes
    Files.write(java.nio.file.Paths.get(bronze, "f1.json"), Seq(
      rec(11, axis(1)), rec(12, axis(3))).mkString("\n").getBytes)
    run()
    assert(ids("drop", 1) == Set(11L))
    assert(ids("pass", 1) == Set(12L))

    // batch 2: third trigger, mixed
    Files.write(java.nio.file.Paths.get(bronze, "f2.json"), Seq(
      rec(21, axis(0)), rec(22, mix(2, 3)), rec(23, axis(2)))
      .mkString("\n").getBytes)
    run()
    assert(ids("drop", 2) == Set(21L))
    assert(ids("pass", 2) == Set(22L, 23L))

    // parity with the BATCH screen: union of written rows (both halves,
    // with their eval_cos) == prep + maxCosExpr + threshold over the
    // union of all ingested vectors — the q_decontaminate_embed plan
    val all = Seq(1L -> axis(0), 2L -> axis(2), 3L -> mix(0, 1),
      11L -> axis(1), 12L -> axis(3),
      21L -> axis(0), 22L -> mix(2, 3), 23L -> axis(2))
    val offline = Similarity.prep(
        all.toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
        col("vec_id"), col("embedding"))
      .withColumn("eval_cos", Similarity.maxCosExpr(refs, col("q"), col("norm")))
      .select(col("id"), col("eval_cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val written = spark.read.parquet(s"$base/pass/batch_*")
      .unionByName(spark.read.parquet(s"$base/drop/batch_*"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(written == offline)
    // and the split is a PARTITION of the inputs
    assert(written.map(_._1) == all.map(_._1).toSet)
    assert(spark.read.parquet(s"$base/pass/batch_*")
      .filter(col("eval_cos") >= Threshold).isEmpty)
    assert(spark.read.parquet(s"$base/drop/batch_*")
      .filter(col("eval_cos") < Threshold).isEmpty)

    // drifted threshold fails loudly
    Files.write(java.nio.file.Paths.get(bronze, "f3.json"), Seq(
      rec(31, axis(0))).mkString("\n").getBytes)
    val badBar = DecontaminateStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      refs, Dim, threshold = 0.5)
    val e1 = intercept[Exception] { badBar.awaitTermination(120000); badBar.processAllAvailable() }
    assert(e1.getMessage != null)

    // drifted EVAL SET fails loudly too (same count, different vectors)
    val drifted = prepRefs(Seq(100L -> axis(2), 101L -> axis(3)))
    val badRefs = DecontaminateStream.start(spark, bronze, schema, s"$base/archive",
      s"$base/state", s"$base/pass", s"$base/drop", s"$base/ckpt",
      drifted, Dim, Threshold)
    val e2 = intercept[Exception] { badRefs.awaitTermination(120000); badRefs.processAllAvailable() }
    assert(e2.getMessage != null)
  }
}
