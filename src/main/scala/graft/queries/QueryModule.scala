package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named-query module: Spark-side queries over `(spark, sfDir)` plus
  * their DuckDB oracle mirrors, merged by [[graft.SparkEntry]]. */
private[queries] trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared per-JVM scratch root for queries that materialize files
  * (bronze round-trips, bucketed tables, on-disk indexes): previous
  * processes' leftovers are removed on first use, and this process
  * cleans its own on exit — repeated Verify/Bench rounds must not
  * accumulate /tmp garbage. */
private[queries] object Scratch {
  lazy val root: String = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    val dir = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_query_scratch")
    if (dir.exists()) rm(dir)
    dir.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(dir)))
    dir.toString
  }
}
