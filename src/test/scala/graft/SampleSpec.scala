package graft

import graft.operators.Sample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation samplers' contracts: hash-gate membership is a
  * deterministic per-key property (not a row-count draw), and the
  * stratified head caps every stratum at k with a stable, key-derived
  * order. */
class SampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")

  test("hashSample: a subset, stable across runs, and exactly the md5-gated keys") {
    val a = Sample.hashSample(docs, col("id"), Seq("0", "1"))
      .collect().map(_.getLong(0)).toSet
    val b = Sample.hashSample(docs, col("id"), Seq("0", "1"))
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "hash gate must be deterministic")
    assert(a.nonEmpty && a.size < 200, s"2/16 gate selected ${a.size} of 200")
    // the gate is exactly the md5 first-hex-char predicate, per key
    val expected = (1L to 200L).filter { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      val first = f"${d(0) & 0xff}%02x".charAt(0)
      first == '0' || first == '1'
    }.toSet
    assert(a == expected)
  }

  test("hashSample of the full hex alphabet keeps every row") {
    val all = Sample.hashSample(docs, col("id"), "0123456789abcdef".map(_.toString))
    assert(all.count() == 200)
  }

  test("stratifiedHead: every stratum capped at k; ranks dense from 1; deterministic") {
    val out = Sample.stratifiedHead(docs, col("lang"), col("id"), k = 10)
      .select("lang", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = out.groupBy(_._1)
    assert(byLang.keySet == Set("lang0", "lang1", "lang2"))
    byLang.values.foreach { rows =>
      assert(rows.length == 10)
      assert(rows.map(_._3).sorted.toSeq == (1 to 10))
    }
    val again = Sample.stratifiedHead(docs, col("lang"), col("id"), k = 10)
      .select("lang", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == again.toSet)
  }

  test("stratifiedHead keeps whole strata smaller than k") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "lang")
    val out = Sample.stratifiedHead(tiny, col("lang"), col("id"), k = 10)
    assert(out.count() == 3)
  }

  test("weightedBernoulli: zero weight never sampled, max weight always; deterministic; bad weight raises") {
    val df = (1L to 400L).map(i => (i, if (i <= 100) 0L else if (i <= 200) 500L else 5L))
      .toDF("id", "w")
    val got = Sample.weightedBernoulli(df, col("id"), col("w"))
      .collect().map(r => r.getLong(0)).toSet
    // w=0 rows: u32 * wmax < 0 is impossible → never kept
    assert(got.intersect((1L to 100L).toSet).isEmpty)
    // w = wmax rows: u32 < 2^32 always → kept with probability 1
    assert((101L to 200L).toSet.subsetOf(got))
    // light rows (p = 1%): a few at most, and the draw is reproducible
    val light = got.intersect((201L to 400L).toSet)
    assert(light.size < 20)
    val again = Sample.weightedBernoulli(df, col("id"), col("w"))
      .collect().map(r => r.getLong(0)).toSet
    assert(again == got)
    // large-but-valid weight (a 40k-char document) is fine now that the
    // cap is 2^31-1; only a truly out-of-range weight fails loudly
    assert(Sample.weightedBernoulli(Seq((1L, 40000L)).toDF("id", "w"), col("id"), col("w"))
      .count() == 1) // single max-weight row: kept with probability 1
    intercept[Exception] {
      Sample.weightedBernoulli(Seq((1L, Long.MaxValue)).toDF("id", "w"), col("id"), col("w")).collect()
    }
  }

  test("topFractionByScore: exact histogram threshold — at least ceil(p*n), only tie-mass overshoot") {
    // scores: 10 rows of 5, 10 of 3, 10 of 1 (n = 30)
    val df = ((0 until 10).map(i => (i.toLong, 5L)) ++
      (10 until 20).map(i => (i.toLong, 3L)) ++
      (20 until 30).map(i => (i.toLong, 1L))).toDF("id", "score")
    def kept(p: Double) = Sample.topFractionByScore(df, col("score"), p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p=0.3: ceil=10 → thr=5, exactly the ten 5s
    assert(kept(0.3) == (0 until 10).map(i => (i.toLong, 5L)).toSet)
    // p=0.4: ceil=12 → thr drops to 3; the WHOLE tie mass at 3 survives (20 rows)
    val k4 = kept(0.4)
    assert(k4.size == 20 && k4.forall(_._2 >= 3L))
    // p=1.0 keeps everything; determinism across runs
    assert(kept(1.0).size == 30)
    assert(kept(0.4) == k4)
    intercept[IllegalArgumentException](Sample.topFractionByScore(df, col("score"), 0.0))
  }

  test("mixByWeights: full epochs exact, fractional gate monotone in w, unlisted sources vanish") {
    val docs = (0 until 120).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    def mix(w: Map[String, Double]) =
      Sample.mixByWeights(docs, col("id"), col("src"), w)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // integer weights: every row of the source appears in exactly w epochs
    val m = mix(Map("s0" -> 3.0, "s1" -> 1.0, "s2" -> 0.25))
    val byId = m.groupBy(_._1)
    (0 until 120 by 4).foreach { i => // s0 rows
      assert(byId(i.toLong).map(_._3).sorted.toSeq == Seq(0L, 1L, 2L), s"id $i epochs wrong")
    }
    (1 until 120 by 4).foreach { i => assert(byId(i.toLong).map(_._3).toSeq == Seq(0L)) }
    // s3 unlisted — absent entirely
    assert(m.forall(_._2 != "s3"))
    // fractional gates: kept set is a deterministic, w-monotone subset
    val q = m.filter(_._2 == "s2").map(_._1).toSet
    assert(q.nonEmpty && q.size < 30, s"0.25 gate kept ${q.size}/30")
    val half = mix(Map("s2" -> 0.5)).map(_._1).toSet
    assert(q.subsetOf(half), "0.25 selection must nest inside 0.5 (same draw, higher gate)")
    assert(mix(Map("s0" -> 3.0, "s1" -> 1.0, "s2" -> 0.25)).sorted.toSeq == m.sorted.toSeq)
    // fractional epoch index is the one past the full epochs: w=1.5 → epoch 1 for gated rows
    val oneHalf = mix(Map("s1" -> 1.5))
    assert(oneHalf.map(_._3).toSet.subsetOf(Set(0L, 1L)))
    assert(oneHalf.count(_._3 == 0L) == 30 && oneHalf.count(_._3 == 1L) > 0)
    intercept[IllegalArgumentException](Sample.mixByWeights(docs, col("id"), col("src"), Map.empty))
    intercept[IllegalArgumentException](
      Sample.mixByWeights(docs, col("id"), col("src"), Map("s0" -> 0.0)))
  }

  test("balanceByUpsampling: r = max div n per group, epochs dense from 0, majority group untouched") {
    // a:5 → r=1, b:2 → r=2, c:1 → r=5
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq("c"))
      .zipWithIndex.map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val out = Sample.balanceByUpsampling(df, col("g")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("g"), r.getAs[Long]("epoch")))
    val byGroup = out.groupBy(_._2)
    assert(byGroup("a").length == 5)  // r=1: unchanged
    assert(byGroup("b").length == 4)  // 2 rows × 2 epochs
    assert(byGroup("c").length == 5)  // 1 row × 5 epochs
    // epochs are dense 0..r-1 per row
    assert(byGroup("c").map(_._3).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.filter(_._2 == "a").forall(_._3 == 0L))
    // deterministic: same output on re-run
    val again = Sample.balanceByUpsampling(df, col("g")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("g"), r.getAs[Long]("epoch")))
    assert(out.sortBy(t => (t._1, t._3)).toSeq == again.sortBy(t => (t._1, t._3)).toSeq)
    intercept[IllegalArgumentException] {
      Sample.balanceByUpsampling(df.withColumnRenamed("id", "epoch"), col("g"))
    }
  }
}
