package graft.queries

import graft.Tables
import graft.operators.{Enrich, EnrichConfig, FailureMode, Kpis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 + J1/J3 — the enrichment operator on the oracled path.
  *
  * Two fixtures:
  *  - `documents` plays the review table: item_id = doc_id+1 (already
  *    dense), the lexicon signal plays the model's sentiment;
  *  - `itemFacts` (lineitem ⋈ orders + DenseId) plays the full-scale
  *    silver table for the KPI-over-enrichment pipeline.
  *
  * Null injection (FIXTURES.md §3): batch id % 10 == 9 → whole batch
  * fails every retry → NullFill (ETL, J1) or Drop (Go, J3). Flaky
  * batches (bid % 7 == 3) fail only the first attempt — retries recover
  * them, so the oracle treats them as plain successes; a retry bug would
  * show up as a correctness mismatch.
  */
object EnrichQueries extends QueryModule {

  /** Lexicon stand-in for the LLM: positive iff text mentions "fast" and
    * never "slow". Mirrored verbatim in SQL. */
  private val lexSignal = col("text").contains("fast") && !col("text").contains("slow")
  private val lexSignalSql = "(text LIKE '%fast%' AND text NOT LIKE '%slow%')"

  /** SQL batch-failure predicate over a 1-based item id. */
  private def failedBatchSql(itemId: String): String =
    s"CAST(FLOOR(($itemId - 1) / 25.0) AS BIGINT) % 10 = 9"

  private def docItems(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") + 1).as("item_id"), col("source"),
        lexSignal.as("signal"))

  /** J1 — ETL merge: enrich in batches of 25, null-fill failed batches,
    * left-join the analysis frame back onto the items. */
  def enrichMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val items = docItems(spark, sfDir)
    val analysis = Enrich.enrich(
      items.select("item_id", "signal"), SentimentScorer("signal"))
    Enrich.merge(items.drop("signal"), analysis)
      // nullable boolean → nullable int for the output: both engines'
      // dataframe bridges canonicalize int-with-null identically (NaN),
      // while null booleans surface as None vs NaN and trip hash compares
      .select(col("item_id"), col("doc_id"), col("source"),
        col("sentiment").cast("int").as("sentiment"))
      .orderBy("item_id")
  }

  /** J3 — Go merge: review scorer, failed batches dropped by the inner
    * join (`loader.go:30-62`). */
  def enrichDrop(spark: SparkSession, sfDir: String): DataFrame = {
    val items = docItems(spark, sfDir)
    val analysis = Enrich.enrich(
      items.select("item_id", "signal"),
      ReviewScorer("signal"),
      EnrichConfig(onFailure = FailureMode.Drop))
    Enrich.mergeDrop(items.drop("signal"), analysis)
      .select(col("item_id"), col("doc_id"), col("classification"), col("review"))
      .orderBy("item_id")
  }

  /** §2.4 requeue — the standalone clients' partial-response semantics:
    * the scorer answers only ids not divisible by 3 on attempt 1; the
    * operator must re-send exactly the missing ids (left_anti of the
    * batch vs the echo) and merge the partial successes, so the final
    * frame is complete except for perma-failed batches (null-filled per
    * row). A broken requeue surfaces as nulls on every 3rd id → hash
    * mismatch. */
  def enrichRequeue(spark: SparkSession, sfDir: String): DataFrame = {
    val items = docItems(spark, sfDir)
    val analysis = Enrich.enrich(
      items.select("item_id", "signal"),
      PartialScorer("signal"),
      EnrichConfig(onFailure = FailureMode.Requeue))
    Enrich.merge(items.drop("signal"), analysis)
      .select(col("item_id"), col("doc_id"), col("source"),
        col("sentiment").cast("int").as("sentiment"))
      .orderBy("item_id")
  }

  /** The flagship re-based pipeline: user KPIs where sentiment comes from
    * the REAL batch-25 enrichment operator over the facts (not an inline
    * column rule) — scan → join → DenseId → enrich → J1 merge → fused
    * KPI agg → min-max (SURVEY.md §3.1 end-to-end). */
  def enrichKpis(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Facts.itemFacts(spark, sfDir)
    // Fused enrich+merge: the two-operator spelling would evaluate the
    // itemFacts plan (join + range sort + zipWithIndex) TWICE — once per
    // merge side — and pay an item_id sort-merge join; enrichCarry
    // computes it once and shuffles once, on batch_id (see Enrich).
    val enriched = Enrich.enrichCarry(items, SentimentScorer("signal")).drop("signal")
    KpiQueries.finish(Kpis.userKpis(enriched), "id", "average_spent")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich_merge" -> enrichMerge,
    "q_enrich_drop" -> enrichDrop,
    "q_enrich_requeue" -> enrichRequeue,
    "q_enrich_kpis" -> enrichKpis)

  val oracles: Map[String, String] = Map(
    "q_enrich_merge" ->
      s"""SELECT doc_id + 1 AS item_id, doc_id, source,
         |  CASE WHEN ${failedBatchSql("doc_id + 1")} THEN NULL
         |       ELSE CAST($lexSignalSql AS INTEGER) END AS sentiment
         |FROM documents ORDER BY item_id""".stripMargin,
    "q_enrich_drop" ->
      s"""SELECT doc_id + 1 AS item_id, doc_id,
         |  CASE WHEN $lexSignalSql THEN 'positive' ELSE 'negative' END AS classification,
         |  'review : ' || (CASE WHEN $lexSignalSql THEN 'positive' ELSE 'negative' END)
         |    || ' item ' || CAST(doc_id + 1 AS VARCHAR) AS review
         |FROM documents
         |WHERE NOT ${failedBatchSql("doc_id + 1")}
         |ORDER BY item_id""".stripMargin,
    // Requeue recovers every dropped id, so the oracle is exactly the
    // merge oracle: nulls only where the batch perma-failed. The
    // distinguishing power is NEGATIVE — an operator that fails to
    // requeue leaves every 3rd id null and mismatches.
    "q_enrich_requeue" ->
      s"""SELECT doc_id + 1 AS item_id, doc_id, source,
         |  CASE WHEN ${failedBatchSql("doc_id + 1")} THEN NULL
         |       ELSE CAST($lexSignalSql AS INTEGER) END AS sentiment
         |FROM documents ORDER BY item_id""".stripMargin,
    "q_enrich_kpis" ->
      s"""WITH items AS (${Facts.itemFactsSql}),
         |facts AS (SELECT id, price,
         |  CASE WHEN ${failedBatchSql("item_id")} THEN NULL ELSE signal END AS sentiment
         |  FROM items),
         |agg AS (SELECT id, ${graft.operators.StableAgg.savgSql("price")} AS avg_raw,
         |  CAST(SUM(CASE WHEN sentiment THEN 1 ELSE 0 END) AS BIGINT) AS positive_reviews,
         |  CAST(SUM(CASE WHEN NOT sentiment THEN 1 ELSE 0 END) AS BIGINT) AS negative_reviews
         |  FROM facts GROUP BY id),
         |${KpiQueries.kpiTail("id", "average_spent")}""".stripMargin)
}
