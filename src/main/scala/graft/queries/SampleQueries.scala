package graft.queries

import graft.Tables
import graft.operators.Sample
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> sampleHash,
    "q_sample_strat" -> sampleStrat)

  val oracles: Map[String, String] = Map(
    "q_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin,
    "q_sample_strat" ->
      s"""WITH r AS (SELECT lang, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         |SELECT lang, doc_id, rk FROM r WHERE rk <= $StratK
         |ORDER BY lang, rk""".stripMargin)
}
