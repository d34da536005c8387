package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named-query module: Spark-side queries over `(spark, sfDir)` plus
  * their DuckDB oracle mirrors, merged by [[graft.SparkEntry]]. */
private[queries] trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
