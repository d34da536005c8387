package graft.streaming

import graft.operators.SnapshotDiff
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous snapshot-diff (CDC by periodic full dumps) — the
  * [[SnapshotDiff]] operator run as a Structured Streaming job over
  * the file queue, for sources replicated by recurring full exports
  * (the common contract when a mutable store offers no changelog):
  *
  * per micro-batch (whose files together form ONE full snapshot):
  *   1. the snapshot reduces to `(keys..., digest)` — canonicalization
  *      runs once per generation;
  *   2. the change feed (added / removed / changed) comes from
  *      [[SnapshotDiff.diffDigests]] against the PERSISTED digest table
  *      of the previous generation — a join of 24-byte rows, never the
  *      snapshots themselves;
  *   3. the new digest table replaces the state for the next trigger.
  *
  * State is one digest row per live key — at 100 TB of snapshot the
  * state is GB-scale and the per-trigger cost is two digest-table
  * passes, independent of how many generations have streamed.
  *
  * Crash contract (the DedupStream discipline): every write lands in a
  * `batch_<id>` subdirectory with mode=overwrite, and the previous
  * generation is the HIGHEST `batch_<id>` below the current batch — a
  * replayed micro-batch that already wrote its own state diffs against
  * exactly what the original run saw, and rewrites exactly its own
  * output.
  */
object CdcStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      changesDir: String,
      checkpointDir: String,
      keys: Seq[String],
      digestOf: DataFrame => Column,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // read twice (diff + state write) — pin per batch
          val newDig = batch
            .select(keys.map(col) :+ digestOf(batch).as("digest"): _*)
            .cache()
          val statePath = new org.apache.hadoop.fs.Path(stateDir)
          val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val prior: Option[String] =
            if (fs.exists(statePath))
              fs.listStatus(statePath).toSeq.map(_.getPath.getName)
                .filter(_.startsWith("batch_"))
                .map(_.stripPrefix("batch_").toLong)
                .filter(_ < batchId)
                .sorted.lastOption.map(id => s"$stateDir/batch_$id")
            else None
          val changes = prior match {
            case Some(p) =>
              SnapshotDiff.diffDigests(spark.read.parquet(p), newDig, keys)
            case None => // first generation: everything is an add
              newDig.select(keys.map(col) :+ lit("added").as("change_type"): _*)
          }
          changes.write.mode("overwrite").parquet(s"$changesDir/batch_$batchId")
          newDig.write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
          newDig.unpersist(blocking = false)
        }
    }
}
