package graft

import graft.operators.ShardManifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The shard-manifest interchange contract: build → save → load
  * round-trips exactly; the digest is order-free (any partitioning of
  * the same shard data folds to the same manifest); verify() accepts
  * the delivered data and loudly rejects a dropped row, a duplicated
  * row, and a drifted unit count; a foreign format, newer version,
  * wrong shape, or mixed stamp all refuse to load. */
class ShardManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_shardman_$tag").toString + "/m"

  private def packed = Seq(
    (0L, 1L, 900L), (0L, 2L, 800L), (0L, 3L, 500L),
    (1L, 4L, 1200L), (1L, 5L, 400L),
    (2L, 6L, 2100L)).toDF("bin", "doc_id", "n")

  test("build → save → load round-trips; digest is order-free") {
    val m = ShardManifest.build(packed, col("bin"), col("doc_id"), col("n"), 2048L)
    val dir = tmp("rt")
    ShardManifest.save(m, dir)
    val loaded = ShardManifest.load(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "n_rows", "n_units", "digest").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(loaded) == rows(m))
    assert(rows(loaded).map(_._1) == Set(0L, 1L, 2L))
    assert(rows(loaded).find(_._1 == 0L).get._2 == 3L)
    assert(rows(loaded).find(_._1 == 0L).get._3 == 2200L)
    // order-free: a shuffled/repartitioned copy folds to the SAME digest
    val reshuffled = ShardManifest.build(
      packed.orderBy(col("n").desc).repartition(7),
      col("bin"), col("doc_id"), col("n"), 2048L)
    assert(rows(reshuffled) == rows(m))
    // the artifact is self-describing
    val stamp = spark.read.parquet(dir)
      .select("format", "version", "budget").distinct().collect()
    assert(stamp.length == 1 && stamp.head.getString(0) == ShardManifest.Format &&
      stamp.head.getInt(1) == ShardManifest.Version && stamp.head.getLong(2) == 2048L)
  }

  test("verify accepts intact data; rejects drop, duplicate, and drift") {
    val m = ShardManifest.build(packed, col("bin"), col("doc_id"), col("n"), 2048L)
    ShardManifest.verify(m, packed, col("bin"), col("doc_id"), col("n"))
    def failsWith(bad: org.apache.spark.sql.DataFrame): String = {
      val e = intercept[IllegalArgumentException] {
        ShardManifest.verify(m, bad, col("bin"), col("doc_id"), col("n"))
      }
      e.getMessage
    }
    // a dropped row (shard 0 loses doc 2)
    assert(failsWith(packed.filter(col("doc_id") =!= 2L)).contains("drifted"))
    // a duplicated row (same digest XORs out, but n_rows/n_units move)
    assert(failsWith(packed.unionAll(packed.filter(col("doc_id") === 5L)))
      .contains("drifted"))
    // a drifted unit count (doc 6's n changes — digest AND n_units move)
    assert(failsWith(packed.withColumn("n",
      when(col("doc_id") === 6L, lit(2101L)).otherwise(col("n")))).contains("drifted"))
    // a lost shard entirely
    assert(failsWith(packed.filter(col("bin") =!= 2L)).contains("drifted"))
  }

  test("foreign format, newer version, wrong shape, and mixed stamps all fail loudly") {
    // wrong shape: a random frame
    val d1 = tmp("shape")
    Seq((1L, "x")).toDF("a", "b").write.parquet(d1)
    val e1 = intercept[IllegalArgumentException] { ShardManifest.load(spark, d1) }
    assert(e1.getMessage.contains(s"not a ${ShardManifest.Format}"))
    // foreign format tag with the right shape
    val m = ShardManifest.build(packed, col("bin"), col("doc_id"), col("n"), 2048L)
    val d2 = tmp("foreign")
    ShardManifest.save(m.withColumn("format", lit("other.shards")), d2)
    val e2 = intercept[IllegalArgumentException] { ShardManifest.load(spark, d2) }
    assert(e2.getMessage.contains("other.shards"))
    // newer version
    val d3 = tmp("ver")
    ShardManifest.save(m.withColumn("version", lit(ShardManifest.Version + 1)), d3)
    val e3 = intercept[IllegalArgumentException] { ShardManifest.load(spark, d3) }
    assert(e3.getMessage.contains(s"version ${ShardManifest.Version + 1}"))
    // mixed stamps (a corrupt concatenation)
    val d4 = tmp("mixed")
    ShardManifest.save(m.unionAll(m.withColumn("version", lit(9))), d4)
    val e4 = intercept[IllegalArgumentException] { ShardManifest.load(spark, d4) }
    assert(e4.getMessage.contains("distinct stamps"))
  }
}
