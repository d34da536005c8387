package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: MEASURE (not argue) the scale-growth claims behind the
  * LSH-family candidate generation — VERDICT r6 gap #3.
  *
  * Builds an `R`-times-larger corpus with the SAME duplicate rate as
  * the input (each replica is token-perturbed for text / element-rotated
  * for vectors, so documents are near-dups only WITHIN a replica and the
  * near-dup structure of each replica is exactly the original's), then
  * records, at 1× and R×:
  *
  *  - band-bucket count, mean/max occupancy, and the within-bucket pair
  *    total (what the bucket self-join enumerates);
  *  - candidate-pair and verified-pair counts.
  *
  * A linear engine shows ~R× pairs and ~flat occupancy (the adaptive
  * families grow their bucket space with log₂ n precisely so occupancy
  * stays put; the fixed-band MinHash/SimHash families keep occupancy
  * flat because bucket keys are content hashes and the vocabulary grows
  * with the corpus). Super-linear growth in any row is a design bug.
  * Output is a markdown table pasted into PLANS.md per round.
  */
object ScaleGrowth {

  /** doc/vec id offset between replicas — far above any real id. */
  private val ReplicaOffset = 100000000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    /** Replica r of the corpus: every token suffixed `_r<r>` — all
      * shingles distinct across replicas (cross-replica Jaccard = 0), so
      * the scaled corpus duplicates the original's near-dup structure
      * exactly R times and a linear candidate generator must emit ~R×
      * the pairs. */
    def scaledDocs(s: Int): DataFrame = {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      (0 until s).map { r =>
        if (r == 0) docs
        else docs.select(
          (col("doc_id") + lit(r * ReplicaOffset)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"_r$r")))).as("text"))
      }.reduce(_ union _)
    }

    /** Replica r of the embeddings: elements rotated by r positions —
      * within-replica cosines are EXACTLY the original's (both sides
      * rotate), cross-replica correlation is generic noise. */
    def scaledEmb(s: Int, dim: Int): DataFrame = {
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      (0 until s).map { r =>
        if (r == 0) emb
        else emb.select(
          (col("vec_id") + lit(r * ReplicaOffset)).as("vec_id"),
          concat(slice(col("embedding"), r + 1, dim - r),
            slice(col("embedding"), 1, r)).as("embedding"))
      }.reduce(_ union _)
    }

    /** (buckets, mean occupancy, max occupancy, Σ c·(c−1)/2). */
    def bucketStats(assignments: DataFrame, keyCols: Seq[String]): (Long, Double, Long, Long) = {
      val r = assignments
        .filter(keyCols.map(c => col(c).isNotNull).reduce(_ && _))
        .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), avg("c"), max("c"),
          sum(expr("c * (c - 1) / 2")).cast("long")).head()
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))
    }

    def row(family: String, scale: Int, n: Long,
        st: (Long, Double, Long, Long), cand: Long, ver: Long): Unit =
      println(f"| $family | ${scale}x | $n | ${st._1} | ${st._2}%.2f | ${st._3} | ${st._4} | $cand | $ver |")

    println("| family | scale | rows | buckets | mean occ | max occ | bucket pairs | candidates | verified |")
    println("|---|---|---|---|---|---|---|---|---|")

    Seq(1, replicas).foreach { s =>
      // --- MinHash banded LSH (q_dedup_minhash operating point) ---
      val docs = scaledDocs(s).cache()
      val nDocs = docs.count()
      val sig = Dedup.minhashSignatureArr(docs, col("doc_id"), col("text"), n = 3, k = 8).cache()
      val bands = Dedup.lshBands(sig, 8, 2).cache()
      val mhStats = bucketStats(bands, Seq("band_idx", "band_val"))
      val cands = Dedup.candidatePairs(bands).cache()
      val nCand = cands.count()
      val candIds = cands.select(col("id_a").as("doc_id"))
        .union(cands.select(col("id_b").as("doc_id"))).distinct()
      val candDocs = docs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      val nVer = Dedup.jaccardVerify(
        cands, Dedup.shinglesRaw(candDocs, col("doc_id"), col("text"), n = 3), 0.6).count()
      row("minhash-lsh (k=8,w=2)", s, nDocs, mhStats, nCand, nVer)

      // --- SimHash banded (q_dedup_simhash_pairs operating point) ---
      val ssig = Dedup.simhash(docs, col("doc_id"), col("text"), bits = 32).cache()
      val sBanded = ssig.select(col("id"),
        explode(array((0 until 4).map(bx =>
          struct(lit(bx).as("band_idx"),
            substring(col("simhash"), bx * 8 + 1, 8).as("band_val"))): _*)).as("b"))
        .select(col("id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
      val shStats = bucketStats(sBanded, Seq("band_idx", "band_val"))
      val shPairs = Dedup.simhashPairs(ssig, maxDist = 2, sigLen = 32).count()
      row("simhash-fixed (4x8b)", s, nDocs, shStats, shPairs, shPairs)

      // --- corpus-adaptive simhash (the fix the fixed row motivates) ---
      val wS = Similarity.adaptiveBits(nDocs, 8)
      val asig = Dedup.simhash(docs, col("doc_id"), col("text"), bits = 4 * wS).cache()
      val aBanded = asig.select(col("id"),
        explode(array((0 until 4).map(bx =>
          struct(lit(bx).as("band_idx"),
            substring(col("simhash"), bx * wS + 1, wS).as("band_val"))): _*)).as("b"))
        .select(col("id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
      val aStats = bucketStats(aBanded, Seq("band_idx", "band_val"))
      val aPairs = Dedup.simhashPairs(asig, maxDist = 2, sigLen = 4 * wS).count()
      row(s"simhash-adaptive (4x${wS}b)", s, nDocs, aStats, aPairs, aPairs)

      // --- adaptive hyperplane LSH over embeddings (q_sim_lsh) ---
      val dim = 64
      val p = Similarity.prep(scaledEmb(s, dim), col("vec_id"), col("embedding")).cache()
      val nVec = p.count()
      val bits = Similarity.adaptiveBits(nVec, 8)
      val annSig = p.select(col("id"), Similarity.lshSignature(col("q"), bits, dim).as("sig"))
      val annStats = bucketStats(annSig, Seq("sig"))
      val annPairs = Similarity.lshPairsAdaptive(p, dim).count()
      row(s"ann-lsh (adaptive ${bits}b)", s, nVec, annStats, annPairs, annPairs)

      // --- banded embedding LSH + cosine threshold (q_dedup_embed) ---
      val width = Similarity.adaptiveBits(nVec, 4)
      val bandedEmb = p
        .select(col("id"), Similarity.lshSignature(col("q"), 4 * width, dim).as("sig"))
        .select(col("id"), explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_idx"),
            substring(col("sig"), b * width + 1, width).as("band_val"))): _*)).as("bb"))
        .select(col("id"), col("bb.band_idx").as("band_idx"), col("bb.band_val").as("band_val"))
      val embStats = bucketStats(bandedEmb, Seq("band_idx", "band_val"))
      val embPairs = Similarity.lshBandedPairs(p, dim).cache()
      val embCand = embPairs.count()
      val embVer = embPairs.filter(col("cos") >= 0.25).count()
      row(s"embed-banded (4x${width}b)", s, nVec, embStats, embCand, embVer)

      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
