package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-query job/stage/task accounting — how much of a query's
  * wall clock is scheduling and materialization overhead (many small
  * jobs: cache builds, broadcast builds, count() gates, RDD-hop passes)
  * vs actual task work. Usage:
  * `runMain graft.JobProfile <sfDir> q_a,q_b` — prints one line per
  * query: wall seconds, #jobs, #stages, #tasks, summed task time.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum",
        math.max(2, cpus.toInt / 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.warmFixtures(spark, sfDir)
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        stageLog.add((s.stageInfo.taskMetrics.executorRunTime, s.stageInfo.numTasks,
          s.stageInfo.name.take(140)))
      }
    })
    val verbose = sys.env.get("JOBPROFILE_STAGES").contains("1")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter(q => names.contains(q._1))
    selected.foreach { case (name, fn) =>
      (1 to 2).foreach { round =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        jobs = 0; stages = 0; tasks = 0L; taskMs = 0L; stageLog.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        println(f"[jobprofile] $name%-28s round=$round wall=$wall%7.2fs jobs=$jobs%4d stages=$stages%4d tasks=$tasks%6d taskTime=${taskMs / 1000.0}%8.2fs")
        if (verbose && round == 2) {
          import scala.jdk.CollectionConverters._
          stageLog.asScala.toSeq.sortBy(-_._1).take(12).foreach { case (ms, nt, nm) =>
            println(f"[jobprofile]   stage ${ms / 1000.0}%7.2fs tasks=$nt%4d  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
