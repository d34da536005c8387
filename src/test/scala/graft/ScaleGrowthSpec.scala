package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The occupancy regression gate behind the PLANS.md scale-growth
  * tables: clone the corpus with the SAME duplicate rate and assert
  * that mean band-bucket occupancy stays within a constant band as the
  * clone factor grows — the invariant that keeps every LSH-family
  * bucket self-join linear in the corpus. This is the spec form of the
  * measurement that caught the fixed-width simhash saturation in round
  * 7 (occupancy 45.6 → 195.7 over one 10×): any future change that
  * reintroduces a saturating bucket space fails here, at test time,
  * instead of in a 100-TB run. Reuses graft.ScaleGrowth's measurement
  * functions, so the gate and the published methodology cannot drift. */
class ScaleGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.01"
  private val Factor = 10
  // constant occupancy band: growth bounded by a scale-independent
  // multiple (2×), NOT by anything proportional to the clone factor —
  // the saturating control grew 4.3× over one 10× and fails this.
  private val Band = 2.0

  private def occBand(name: String, occ1: Double, occN: Double): Unit = {
    assert(occN <= occ1 * Band + 1e-9,
      f"$name%s: mean occupancy grew $occ1%.2f -> $occN%.2f over ${Factor}x — " +
        "bucket space is not tracking the corpus (saturation = quadratic pair join)")
  }

  test("minhash-lsh, simhash-adaptive, ann-lsh, embed-banded hold a constant occupancy band over a 10x clone") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val n1 = docs1.count()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    val nN = docsN.count()
    assert(nN == n1 * Factor)

    val mh1 = ScaleGrowth.minhashStats(docs1, n1)
    val mhN = ScaleGrowth.minhashStats(docsN, nN)
    occBand("minhash-lsh", mh1.meanOcc, mhN.meanOcc)
    // same-rate clone ⇒ verified pairs scale exactly with the factor
    assert(mhN.verified == mh1.verified * Factor,
      s"minhash verified pairs ${mh1.verified} -> ${mhN.verified}: not linear")

    val (_, sa1) = ScaleGrowth.simhashAdaptiveStats(docs1, n1)
    val (_, saN) = ScaleGrowth.simhashAdaptiveStats(docsN, nN)
    occBand("simhash-adaptive", sa1.meanOcc, saN.meanOcc)

    // prefix-filter join: replicas carry disjoint token spaces, so
    // bucket count grows with the factor, occupancy stays flat, and
    // the VERIFIED pair set scales exactly linearly
    val sj1 = ScaleGrowth.simjoinStats(docs1, n1)
    val sjN = ScaleGrowth.simjoinStats(docsN, nN)
    occBand("simjoin-prefix", sj1.meanOcc, sjN.meanOcc)
    assert(sjN.verified == sj1.verified * Factor,
      s"simjoin verified pairs ${sj1.verified} -> ${sjN.verified}: not linear")

    val dim = 64
    val emb1 = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val p1 = Similarity.prep(emb1, col("vec_id"), col("embedding")).cache()
    val v1 = p1.count()
    val pN = Similarity.prep(ScaleGrowth.scaledEmb(emb1, Factor, dim),
      col("vec_id"), col("embedding")).cache()
    val vN = pN.count()
    val (_, ann1) = ScaleGrowth.annLshStats(p1, v1, dim)
    val (_, annN) = ScaleGrowth.annLshStats(pN, vN, dim)
    occBand("ann-lsh", ann1.meanOcc, annN.meanOcc)

    val (_, eb1) = ScaleGrowth.embedBandedStats(p1, v1, dim)
    val (_, ebN) = ScaleGrowth.embedBandedStats(pN, vN, dim)
    occBand("embed-banded", eb1.meanOcc, ebN.meanOcc)

    spark.catalog.clearCache()
  }

  test("the saturating fixed-width control FAILS the band (the gate detects the bug class)") {
    val docs1 = Tables.documents(spark, sf).select("doc_id", "text").cache()
    val n1 = docs1.count()
    val docsN = ScaleGrowth.scaledDocs(docs1, Factor).cache()
    // fixed 4×8-bit simhash: 1024 possible buckets, occupancy must grow
    // ~linearly with the corpus — the exact failure mode the gate exists
    // to catch; if THIS passes the band, the gate has gone soft
    val f1 = ScaleGrowth.simhashStats(docs1, n1, w = 8)
    val fN = ScaleGrowth.simhashStats(docsN, n1 * Factor, w = 8)
    assert(fN.meanOcc > f1.meanOcc * Band,
      s"fixed-width control stayed in band (${f1.meanOcc} -> ${fN.meanOcc}) — gate is not discriminating")
    spark.catalog.clearCache()
  }
}
