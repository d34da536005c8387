package graft.queries

import graft.Tables
import graft.operators.StableAgg
import graft.streaming.EventWindows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Windowed event KPIs, batch form — the SAME aggregation the streaming
  * variant runs (EventWindows.dailyKpis), so the DuckDB oracle checks
  * the arithmetic of the streaming plan. Also exercises F6 (declared-
  * schema from_json on the props column).
  */
object EventQueries extends QueryModule {

  def eventWindow(spark: SparkSession, sfDir: String): DataFrame =
    EventWindows.dailyKpis(Tables.events(spark, sfDir))
      .select(col("day"), col("event_type"), col("n_events"),
        Rnd.r(col("total_value"), 2).as("total_value"), col("sum_k"))
      .orderBy("day", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_window" -> eventWindow)

  val oracles: Map[String, String] = Map(
    "q_event_window" ->
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         |  COUNT(*) AS n_events,
         |  ${Rnd.sql(StableAgg.ssumSql("value"), 2)} AS total_value,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)
}
