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
  * output. One dump file per trigger is ENFORCED (maxFilesPerTrigger=1)
  * so two queued generations can never merge into one batch. State
  * generations below the prior are pruned after each commit — disk
  * holds at most two digest tables, however long the stream runs (the
  * `changes/batch_<id>` FEED is the consumer-owned output and is never
  * touched).
  *
  * Limitation (by contract, not accident): a ZERO-ROW dump is
  * indistinguishable from "no data arrived" inside foreachBatch, so
  * empty batches are skipped — truncating the source to nothing must
  * ship a tombstone generation (e.g. one sentinel row) rather than an
  * empty file, or the removals will be emitted only on the next
  * non-empty generation.
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
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(!keys.contains("digest"),
      "CdcStream: 'digest' is reserved for the state-table digest column")
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger,
      maxFilesPerTrigger = 1) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // read twice (diff + state write) — pin per batch
          val newDig = batch
            .select(keys.map(col) :+ digestOf(batch).as("digest"): _*)
            .cache()
          val prior: Option[(Long, String)] = FileQueue.batchDirs(spark, stateDir)
            .filter(_._1 < batchId).sortBy(_._1).lastOption
          val changes = prior match {
            case Some((_, p)) =>
              SnapshotDiff.diffDigests(spark.read.parquet(p), newDig, keys)
            case None => // first generation: everything is an add
              newDig.select(keys.map(col) :+ lit("added").as("change_type"): _*)
          }
          changes.write.mode("overwrite").parquet(s"$changesDir/batch_$batchId")
          newDig.write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
          newDig.unpersist(blocking = false)
          // retention: once this generation's state is committed, only
          // the prior can ever be read again (and only by a replay of
          // THIS batch) — everything below it is dead weight
          prior.foreach { case (id, _) =>
            FileQueue.pruneBatchDirsBelow(spark, stateDir, keepFrom = id) }
        }
    }
  }
}
