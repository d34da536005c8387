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

  private val PackBudget = 2048L

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

  /** Length-weighted Bernoulli sample: longer documents proportionally
    * likelier, decided by exact integer cross-multiplication (no float
    * op — see the operator note), per-key reproducible. */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame =
    Sample.weightedBernoulli(Tables.documents(spark, sfDir), col("doc_id"), col("n_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> sampleHash,
    "q_sample_strat" -> sampleStrat,
    "q_sample_weighted" -> sampleWeighted,
    "q_pack_sequences" -> packSequences)

  val oracles: Map[String, String] = Map(
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
    "q_pack_sequences" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS offset_end,
         |  CAST(FLOOR((SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars)
         |    / $PackBudget.0) AS BIGINT) AS bin
         |FROM documents ORDER BY doc_id""".stripMargin)
}
