package graft.queries

import graft.Tables
import graft.operators.DenseId
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small relational operators from SURVEY.md §2 that are not part of the
  * KPI or enrichment families: dense row indexing (P2), limits (P9/O2),
  * JSON encode/decode (F6), prompt folding (F1), pool assignment (J4/F4/
  * F5). Each has a DuckDB mirror.
  */
object RelationalQueries extends QueryModule {

  /** P2 — dense 1-based item_id over lineitem's unique four-column key
    * (`extractor.go:107-113`), via the distributed sort + zipWithIndex
    * operator (no single-partition window). */
  def itemIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    DenseId.withDenseId(
      Tables.lineitem(spark, sfDir).select(keys.map(col): _*),
      keys.map(col), "item_id")
      .orderBy("item_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_item_index" -> itemIndex)

  val oracles: Map[String, String] = Map(
    "q_item_index" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber) AS item_id
        |FROM lineitem ORDER BY item_id""".stripMargin)
}
