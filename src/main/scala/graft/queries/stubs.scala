package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

// Placeholder modules — filled in milestone by milestone (SURVEY.md §7.2).
private[queries] trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object EventQueries extends QueryModule {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
