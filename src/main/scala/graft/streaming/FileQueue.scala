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
      trigger: Trigger = Trigger.AvailableNow())(
      process: (DataFrame, Long) => Unit): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 10)
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
}
