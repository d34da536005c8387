package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Dev tool: one-line physical-plan audit per registered query —
  * exchanges, broadcast vs sort-merge joins, parquet scans, codegen
  * spans — the numbers that decide whether a plan survives a 100×
  * scale-up. Output is pasted into PLANS.md per round.
  *
  * Counts are TREE-node counts over the physical plan, not string
  * matches: a cached frame prints its defining plan under every
  * InMemoryRelation reference (so string counts overcount shared
  * subplans by their fan-out), but in the operator tree the cache scan
  * is a leaf — each physical exchange is counted once, as executed. AQE
  * is disabled for the audit session only, so the static plan (with its
  * codegen spans) is what's inspected; harness sessions keep AQE on.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffle exchanges | broadcast joins | sort-merge joins | file scans | in-memory scans | codegen spans |")
    println("|---|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // Walk the main tree plus each DISTINCT cached plan exactly once
        // (a cache materializes once however many scans reference it);
        // cached plans can themselves reference other caches, hence the
        // worklist.
        val seen = scala.collection.mutable.Set[AnyRef]()
        val work = scala.collection.mutable.Queue[SparkPlan](
          fn(spark, sfDir).queryExecution.executedPlan)
        val nodes = scala.collection.mutable.ArrayBuffer[SparkPlan]()
        while (work.nonEmpty) {
          val p = work.dequeue()
          nodes ++= p.collect { case x => x }
          p.collect { case s: InMemoryTableScanExec => s.relation }.foreach { rel =>
            if (seen.add(rel.cacheBuilder)) work.enqueue(rel.cachedPlan)
          }
        }
        def n(pred: PartialFunction[SparkPlan, Unit]) =
          nodes.count(pred.isDefinedAt)
        println(s"| $name | ${n { case _: ShuffleExchangeExec => }} | " +
          s"${n { case _: BroadcastHashJoinExec => }} | " +
          s"${n { case _: SortMergeJoinExec => }} | " +
          s"${n { case _: FileSourceScanExec => }} | " +
          s"${n { case _: InMemoryTableScanExec => }} | " +
          s"${n { case _: WholeStageCodegenExec => }} |")
      } catch { case e: Throwable =>
        println(s"| $name | ERROR ${e.getMessage.take(40)} | - | - | - | - | - |")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
