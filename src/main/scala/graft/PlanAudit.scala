package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: one-line physical-plan audit per registered query —
  * exchanges, broadcast vs sort-merge joins, parquet scans, codegen
  * spans — the numbers that decide whether a plan survives a 100×
  * scale-up. Output is pasted into PLANS.md per round. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffle exchanges | broadcast joins | sort-merge joins | parquet scans | codegen spans |")
    println("|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(p: String) = p.r.findAllIn(plan).size
        // "Exchange" alone would also count BroadcastExchange (the
        // broadcast DISTRIBUTION, not a shuffle) — match shuffle forms
        val shuffles = n("Exchange (hashpartitioning|rangepartitioning|SinglePartition)")
        println(s"| $name | $shuffles | ${n("BroadcastHashJoin")} | " +
          s"${n("SortMergeJoin")} | ${n("Scan parquet")} | ${n("\\*\\(")} |")
      } catch { case e: Throwable =>
        println(s"| $name | ERROR ${e.getMessage.take(40)} | - | - | - | - |")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
