package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing on the oracled path: documents' text bytes play
  * the opaque media payload (ASCII, so byte positions == character
  * positions and DuckDB can mirror the stub decoder exactly). */
object MediaQueries extends QueryModule {

  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("media"))
    Multimodal.extractFeatures(media, Multimodal.StubDecoder, batchSize = 16)
      .toDF()
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> mediaFeatures)

  // min(n_chars)=48 > 22, so byte positions 0/1/7/14/21 never wrap.
  private def by(pos: Int) = s"ascii(substr(text, ${pos + 1}, 1))"

  val oracles: Map[String, String] = Map(
    "q_media_features" ->
      s"""SELECT doc_id AS media_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  1 + ${by(0)} % 64 AS width,
         |  1 + ${by(1)} % 64 AS height,
         |  CASE WHEN doc_id % 3 = 2 THEN 1 + CAST(FLOOR(length(text) / 100.0) AS INTEGER) ELSE 1 END AS n_frames,
         |  ${by(0)} / 255.0 AS f0, ${by(7)} / 255.0 AS f1,
         |  ${by(14)} / 255.0 AS f2, ${by(21)} / 255.0 AS f3
         |FROM documents ORDER BY media_id""".stripMargin)
}
