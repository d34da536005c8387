package graft.queries

import graft.Tables
import graft.operators.{PrefixSum, Sample}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling / curation family over `documents`: deterministic hash-gate
  * sampling and stratified per-class heads — the reproducible-mix
  * operations of a training-data pipeline, mirrored exactly in DuckDB
  * (md5 of the stringified key is the shared randomness). */
object SampleQueries extends QueryModule {

  private val StratK = 50

  /** 2/16 deterministic sample: first md5 hex char ∈ {0,1}. */
  def sampleHash(spark: SparkSession, sfDir: String): DataFrame =
    Sample.hashSample(Tables.documents(spark, sfDir), col("doc_id"), Seq("0", "1"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Per-language head of 50, drawn in md5-of-key order. */
  def sampleStrat(spark: SparkSession, sfDir: String): DataFrame =
    Sample.stratifiedHead(Tables.documents(spark, sfDir), col("lang"), col("doc_id"), StratK)
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy("lang", "rk")

  private[queries] val PackBudget = 2048L

  /** Offset-based sequence packing of the corpus into 2048-char bins in
    * doc_id order: distributed prefix sum (no whole-frame window) +
    * slice-at-boundary bin ids. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame =
    PrefixSum.packByBudget(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars")),
      Seq(col("doc_id")), col("n_chars"), PackBudget, "bin",
      // doc_id is the unique order key — an explicit tiebreaker skips
      // the default content-hash pass entirely
      tieBreaker = Some(col("doc_id")))
      .select(col("doc_id"), col("n_chars"), col("bin_end").as("offset_end"), col("bin"))
      .orderBy("doc_id")

  /** Shard-manifest interchange on the oracle gate (q_shard_manifest,
    * [[graft.operators.ShardManifest]] — VERDICT r14 item 5): the
    * packed corpus above no longer ends at a frame — its per-shard
    * manifest (row count, summed units, order-free 60-bit XOR digest)
    * is BUILT, SAVED under the stamped contract, RE-LOADED through the
    * validating loader, and only THEN emitted, so the interchange
    * round-trip itself sits on the correctness gate (the
    * q_bpe_encode_bytes discipline). DuckDB recomputes every manifest
    * row from the same packing replay — a drifted digest, count, or a
    * lost shard mismatches. */
  def shardManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val packed = PrefixSum.packByBudget(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars")),
      Seq(col("doc_id")), col("n_chars"), PackBudget, "bin",
      tieBreaker = Some(col("doc_id")))
    val m = graft.operators.ShardManifest.build(
      packed, col("bin"), col("doc_id"), col("n_chars"), PackBudget)
    val path = s"${Scratch.root}/shard_manifest_${new java.io.File(sfDir).getName}"
    graft.operators.ShardManifest.save(m, path)
    graft.operators.ShardManifest.load(spark, path)
      .select(col("shard"), col("n_rows"), col("n_units"), col("digest"))
      .orderBy("shard")
  }

  /** Length-weighted Bernoulli sample: longer documents proportionally
    * likelier, decided by exact integer cross-multiplication (no float
    * op — see the operator note), per-key reproducible. */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame =
    Sample.weightedBernoulli(Tables.documents(spark, sfDir), col("doc_id"), col("n_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** Mixture balancing by integer upsampling: the corpus is ~44% `en`,
    * so minority languages replicate into `max_count div count` epochs
    * (en×1 … fr×3 on this skew) — the multilingual training-mix move.
    * Counts aggregate + broadcast factor join + map-side explode; the
    * corpus itself never shuffles
    * ([[graft.operators.Sample.balanceByUpsampling]]). */
  def sampleBalance(spark: SparkSession, sfDir: String): DataFrame =
    Sample.balanceByUpsampling(Tables.documents(spark, sfDir), col("lang"))
      .select(col("doc_id"), col("lang"), col("epoch"))
      .orderBy("doc_id", "epoch")

  /** q_corpus_mix weights: multi-epoch sources, an exact 1.0, pure
    * fractions, and 15 unlisted sources that must vanish from the mix.
    * Both the Spark plan and the DuckDB oracle derive their integer
    * gate constants from THIS map, so the multiset is engine-exact. */
  private val MixWeights: Seq[(String, Double)] = Seq(
    "src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25, "src3" -> 3.0, "src4" -> 0.5)

  /** Training-mix construction: per-source target weights (fractional
    * epochs included) + the deterministic interleaved order — the
    * "sampling proportions" step between curation and the data loader.
    * Weight lookup is a literal when-chain, replication a map-side
    * explode, the gate a narrow filter; only the order rank exchanges
    * ([[graft.operators.DenseId]] range-sort, never a 1-partition
    * window). */
  def corpusMix(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val mixed = Sample.mixByWeights(docs, col("doc_id"), col("source"), MixWeights.toMap)
    graft.operators.DenseId.withDenseId(
      mixed.withColumn("__key",
        md5(concat(col("doc_id").cast("string"), lit(":"), col("epoch").cast("string"))
          .cast("binary"))),
      Seq(col("__key"), col("doc_id"), col("epoch")), "pos")
      .select(col("doc_id"), col("source"), col("epoch"), col("pos"))
      .orderBy("pos")
  }

  /** Temperature-weighted domain mixture (q_domain_mix,
    * [[graft.operators.Sample.temperatureMix]]): the mT5/GPT-3
    * α-sampling knob at T = 1/2, run over the LANGUAGE domains — the
    * one skewed natural grouping in this corpus (`en` is ~44%; `source`
    * is uniform by construction, so a source-keyed mixture would
    * exercise nothing). The head flattens (en admits at ~0.18) while
    * the tail keeps more of its mass (~0.32 at this skew); weights,
    * thresholds, and the admitted SET are all integer-exact, and the
    * oracle replays counts, the scaled isqrt, both integral divisions,
    * and the salted md5 draw. */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame =
    Sample.temperatureMix(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
        col("doc_id"), col("lang"))
      .select(col("lang"), col("doc_id"), col("n_dom"), col("w_scaled"), col("thresh"))
      .orderBy("lang", "doc_id")

  /** Deterministic corpus SHUFFLE for training order: position = dense
    * rank in md5-of-id order — the distributed spelling of a data
    * loader's seeded permutation (every engine and every re-run agrees
    * on the order, and no single task ever holds the corpus:
    * [[graft.operators.DenseId]]'s range-sort + zipWithIndex, not a
    * 1-partition window). Downstream training shards read contiguous
    * `pos` ranges and get an unbiased mix of the corpus. */
  def corpusShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    graft.operators.DenseId.withDenseId(
      docs.withColumn("__key", md5(col("doc_id").cast("string").cast("binary"))),
      Seq(col("__key"), col("doc_id")), "pos")
      .select(col("doc_id"), col("source"), col("pos"))
      .orderBy("pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_corpus_mix" -> corpusMix,
    "q_domain_mix" -> domainMix,
    "q_corpus_shuffle" -> corpusShuffle,
    "q_sample_hash" -> sampleHash,
    "q_sample_strat" -> sampleStrat,
    "q_sample_weighted" -> sampleWeighted,
    "q_sample_balance" -> sampleBalance,
    "q_pack_sequences" -> packSequences,
    "q_shard_manifest" -> shardManifest)

  /** (source, full epochs, fractional-gate threshold) VALUES rows for
    * the oracle — the SAME driver-computed constants the plan uses. */
  private val mixValuesSql = MixWeights.map { case (s, w) =>
    val full = math.floor(w).toLong
    val gate = math.floor((w - math.floor(w)) * 4294967296d).toLong
    s"('$s', $full, $gate)"
  }.mkString(", ")

  val oracles: Map[String, String] = Map(
    // T = 1/2 mixture replay: counts → scaled isqrt weights → the two
    // integral divisions → the salted md5 admission draw. DuckDB SUMs
    // are HUGEINT, so every emitted integer is CAST back to BIGINT.
    "q_domain_mix" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n * 1000000 AS DOUBLE))) AS BIGINT) AS w FROM c),
        |t AS (SELECT lang, n, w,
        |    CAST(LEAST(4294967296,
        |      ((4294967296 * w) // (SELECT CAST(SUM(w) AS BIGINT) FROM w))
        |      * ((SELECT CAST(SUM(n) AS BIGINT) FROM w) // 4) // n) AS BIGINT) AS thresh
        |  FROM w)
        |SELECT d.lang, d.doc_id, t.n AS n_dom, t.w AS w_scaled, t.thresh
        |FROM documents d JOIN t USING (lang)
        |WHERE CAST('0x' || substr(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      < t.thresh
        |ORDER BY lang, doc_id""".stripMargin,
    "q_corpus_mix" ->
      s"""WITH w(source, f, gate) AS (VALUES $mixValuesSql),
         |m AS (SELECT d.doc_id, d.source, r.epoch
         |  FROM documents d JOIN w ON d.source = w.source
         |  JOIN range(0, 65) r(epoch) ON r.epoch <= w.f
         |  WHERE r.epoch < w.f
         |     OR CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) < w.gate)
         |SELECT doc_id, source, epoch,
         |  ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)),
         |                     doc_id, epoch) AS pos
         |FROM m ORDER BY pos""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT doc_id, source,
        |  ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
        |FROM documents ORDER BY pos""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents, (SELECT MAX(n_chars) AS wmax FROM documents)
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) * wmax
        |      < n_chars * CAST(4294967296 AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "q_sample_strat" ->
      s"""WITH r AS (SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         |SELECT lang, doc_id, rk FROM r WHERE rk <= $StratK
         |ORDER BY lang, rk""".stripMargin,
    // per-row epoch fan-out via scalar range() inside list_transform
    // (lateral range() on a column is not supported in DuckDB)
    "q_sample_balance" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |f AS (SELECT lang, (SELECT MAX(n) FROM c) // n AS r FROM c)
        |SELECT d.doc_id, d.lang,
        |  unnest(list_transform(range(0, f.r), e -> e)) AS epoch
        |FROM documents d JOIN f USING (lang)
        |ORDER BY doc_id, epoch""".stripMargin,
    // the manifest replay: the same packing window, then per-shard
    // counts, unit sums, and the order-free XOR of row signatures
    "q_shard_manifest" ->
      s"""WITH p AS (SELECT doc_id, n_chars,
         |    CAST(FLOOR((SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars)
         |      / $PackBudget.0) AS BIGINT) AS bin
         |  FROM documents)
         |SELECT bin AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_units,
         |  CAST(bit_xor(${graft.operators.ShardManifest.rowSigSql("doc_id", "n_chars")}) AS BIGINT) AS digest
         |FROM p GROUP BY bin ORDER BY shard""".stripMargin,
    "q_pack_sequences" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS offset_end,
         |  CAST(FLOOR((SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars)
         |    / $PackBudget.0) AS BIGINT) AS bin
         |FROM documents ORDER BY doc_id""".stripMargin)
}
