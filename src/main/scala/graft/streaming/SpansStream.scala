package graft.streaming

import graft.operators.{CacheScope, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming SUBSTRING-level dedup at ingestion — the composition
  * [[Dedup.incrementalRepeatedSpans]] exists for, run as a Structured
  * Streaming job over the bronze file queue (the [[DedupStream]]
  * pattern applied to verbatim repeated spans):
  *
  * per micro-batch of documents:
  *   1. batch spans = anchors of the batch's positional n-gram digests
  *      that hit the PERSISTED digest state or repeat within the batch,
  *      merged to maximal spans — old documents are never re-read, and
  *      old×old repetition never re-pairs (that report was emitted when
  *      those batches arrived);
  *   2. the span report lands in `spansDir/batch_<id>`;
  *   3. the batch's digests append to the state as `stateDir/batch_<id>`
  *      MINUS digests the state already holds (one anti-join), so the
  *      union of batch dirs stays a DISTINCT digest set — the probe
  *      side is never re-distincted, the invariant
  *      [[Dedup.incrementalRepeatedSpans]] documents.
  *
  * The digest state is 16 bytes per distinct gram — the substring
  * analogue of DedupStream's band table, and the artifact a 100 TB
  * ingestion pipeline persists (hash-clustered on `dg` at scale, per
  * the operator's scaladoc).
  *
  * Crash contract: every write lands in a `batch_<id>` subdirectory
  * with mode=overwrite, so a replayed micro-batch rewrites exactly its
  * own output; the state read EXCLUDES the replaying batch's own dir
  * (a crash between the state write and the checkpoint commit would
  * otherwise feed the batch its own digests as "old" state and turn
  * every batch document fully span-covered).
  */
object SpansStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      spansDir: String,
      stateDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      n: Int = 8): StreamingQuery =
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          val docs = batch.select(col("doc_id"), col("text"))
          // replay guard: never read this batch's own digests as state
          val priorState: Seq[String] = FileQueue.batchDirs(spark, stateDir)
            .filter(_._1 != batchId).map(_._2)
          val state =
            if (priorState.nonEmpty) spark.read.parquet(priorState: _*)
            else Seq.empty[String].toDF("dg")
          // the batch digest set feeds the span report (via the pinned
          // occurrence frame inside the operator) AND the state delta —
          // batch-owned scope, released per trigger (a long-running
          // stream must not accumulate cache entries)
          val scope = new CacheScope
          try {
            Dedup.incrementalRepeatedSpans(
                docs, col("doc_id"), col("text"), state, n, scope)
              .write.mode("overwrite").parquet(s"$spansDir/batch_$batchId")
            // no pin: the digest-state frame is consumed exactly once
            // (its occ subplan already hits the scope-pinned cache)
            Dedup.spanDigestState(docs, col("doc_id"), col("text"), n)
              .join(state, Seq("dg"), "left_anti")
              .write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
          } finally scope.close()
        }
    }
}
