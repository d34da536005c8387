package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** T2 — the reference's file-queue "streaming": list → process → move,
  * ordered by arrival, at-least-once (`S1`+`K5`; crash before move ⇒
  * reprocess). Structured Streaming's file source subsumes the whole
  * loop and upgrades it to exactly-once within Spark via the checkpoint
  * WAL; `cleanSource=archive` IS the move-after-processing contract.
  *
  * `maxFilesPerTrigger=10` mirrors the reference's download wave of 10
  * (`extractor.go:93`); `latestFirst=false` keeps arrival order (O1).
  */
object FileQueue {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      // reference wave of 10; generation-delimited consumers
      // (CdcStream) pin 1 so distinct dumps never merge into one batch
      maxFilesPerTrigger: Int = 10)(
      process: (DataFrame, Long) => Unit): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .json(srcDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) => process(batch, id) }
      .start()
  }

  /** Enumerate a state directory's `batch_<id>` generation subdirs as
    * (id, path) pairs — the shared primitive of the crash-replay
    * discipline: a replaying batch must see exactly the state the
    * original run saw, so every call site filters these ids against
    * its own batch id (DedupStream excludes its own; CdcStream takes
    * the highest below it). */
  def batchDirs(spark: SparkSession, dir: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("batch_"))
      .flatMap(p => scala.util.Try(p.getName.stripPrefix("batch_").toLong)
        .toOption.map(id => (id, p.toString)))
  }

  /** Delete generation dirs with id strictly below `keepFrom` — state
    * retention for streams where only the latest prior generation is
    * ever read. Safe order: call AFTER the current generation's state
    * write commits; a crash replay then still finds its prior (the
    * highest id below current survives every prune). */
  def pruneBatchDirsBelow(spark: SparkSession, dir: String, keepFrom: Long): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batchDirs(spark, dir).filter(_._1 < keepFrom).foreach { case (_, p) =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true)
    }
  }
}
