package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch pair + the two-pass heavy-hitter operator built on
  * it. The load-bearing properties: estimates OVERESTIMATE only (the
  * superset guarantee the exact recount depends on), the serialized
  * sketch is identical at any parallelism (distributive merge), and the
  * operator's answer equals the plain group-count-having answer even
  * when the sketch is squeezed until it collides. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 hot keys (60/30/20) + 50 singletons
  private lazy val keys =
    (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (1 to 50).map(i => s"rare_$i")).toDF("key")

  private def buildCms(df: org.apache.spark.sql.DataFrame, depth: Int, width: Int): Array[Byte] =
    df.select(xxhash64(col("key")).as("h"))
      .agg(call_function("cms_build", col("h"), lit(depth), lit(width)).as("c"))
      .head.getAs[Array[Byte]](0)

  test("estimates are exact with a wide sketch and never underestimate with a tiny one") {
    val truth = keys.groupBy("key").count().as[(String, Long)].collect().toMap
    for (width <- Seq(1 << 12, 8)) {
      val cms = buildCms(keys, depth = 3, width = width)
      val est = keys.distinct()
        .select(col("key"),
          call_function("cms_query", lit(cms), xxhash64(col("key"))).as("est"))
        .as[(String, Long)].collect().toMap
      truth.foreach { case (k, n) =>
        assert(est(k) >= n, s"width=$width UNDERestimated $k: ${est(k)} < $n")
        if (width == (1 << 12)) assert(est(k) == n, s"wide sketch not exact for $k")
      }
    }
  }

  test("serialized sketch is byte-identical at any parallelism and row order") {
    val a = buildCms(keys.repartition(1), 4, 1 << 10)
    val b = buildCms(keys.repartition(13).sortWithinPartitions(col("key").desc), 4, 1 << 10)
    assert(java.util.Arrays.equals(a, b))
  }

  test("heavyHitters equals the exact answer, even with a colliding 8-cell sketch") {
    val exact = keys.groupBy("key").count().filter(col("count") >= 20)
      .as[(String, Long)].collect().sorted.toSeq
    for (width <- Seq(1 << 14, 8)) {
      val got = TextStats.heavyHitters(keys, col("key"), minCount = 20, depth = 3, width = width)
        .as[(String, Long)].collect().sorted.toSeq
      assert(got == exact, s"width=$width: $got != $exact")
    }
  }

  test("null keys are skipped; empty input yields the all-zero sketch") {
    val withNulls = (Seq(Some("x"), None, Some("x"), None): Seq[Option[String]]).toDF("key")
    val cms = buildCms(withNulls, 2, 64)
    val est = Seq("x").toDF("key")
      .select(call_function("cms_query", lit(cms), xxhash64(col("key"))))
      .as[Long].head()
    assert(est == 2L)
    val empty = buildCms(keys.filter(lit(false)), 2, 64)
    val zero = Seq("a").toDF("key")
      .select(call_function("cms_query", lit(empty), xxhash64(col("key"))))
      .as[Long].head()
    assert(zero == 0L)
  }

  test("malformed blobs and bad sizing fail descriptively") {
    def probe(bytes: Array[Byte]) =
      Seq(1L).toDF("h").select(call_function("cms_query", lit(bytes), col("h"))).collect()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    val short = intercept[Exception](probe(Array[Byte](1, 2)))
    assert(msgs(short).exists(_.contains("not a count-min sketch")), msgs(short))
    val bad = intercept[Exception](probe(new Array[Byte](24)))
    assert(msgs(bad).exists(_.contains("malformed")), msgs(bad))
    intercept[Exception] {
      keys.select(xxhash64(col("key")).as("h"))
        .agg(call_function("cms_build", col("h"), lit(0), lit(64))).collect()
    }
    intercept[Exception] {
      keys.select(xxhash64(col("key")).as("h"))
        .agg(call_function("cms_build", col("h"), lit(4), lit(1 << 23))).collect()
    }
  }

  test("broadcast-delivered sketch (literalMaxBytes=0) matches the literal path") {
    val viaLit = TextStats.heavyHitters(keys, col("key"), minCount = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val viaBcast = TextStats.heavyHitters(keys, col("key"), minCount = 20, literalMaxBytes = 0)
    assert(viaBcast.collect().map(r => (r.getString(0), r.getLong(1))).toSet == viaLit)
    // analyzed, not optimized: ConvertToLocalRelation constant-evaluates
    // this tiny local-relation test frame, erasing the probe expression
    // (BroadcastRef itself is non-foldable, so it can never re-enter a
    // surviving plan as a literal — BloomSpec pins that on a real scan)
    val refs = viaBcast.queryExecution.analyzed.collect { case p =>
      p.expressions.flatMap(_.collect { case b: graft.expressions.BroadcastRef => b })
    }.flatten
    assert(refs.nonEmpty, "expected cms_query to read a BroadcastRef")
  }
}
