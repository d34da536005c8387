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
  *      union of live batch dirs stays a DISTINCT digest set — the
  *      probe side is never re-distincted, the invariant
  *      [[Dedup.incrementalRepeatedSpans]] documents.
  *
  * The digest state is 16 bytes per distinct gram — the substring
  * analogue of DedupStream's band table, and the artifact a 100 TB
  * ingestion pipeline persists.
  *
  * STATE COMPACTION (a long-running stream must not accumulate one
  * delta dir per batch forever, nor re-list/re-read thousands of small
  * parquet dirs per trigger — ADVICE r10): every `compactEvery` live
  * generations, the batch writes the FULL distinct state (prior state ∪
  * its own delta) as its generation dir and stamps it with a `_FULL`
  * marker. The state READ rule is: newest `_FULL` generation plus every
  * later delta — so per-trigger state cost is one clustered dir plus at
  * most `compactEvery` deltas, flat in stream lifetime. Generations
  * below the newest `_FULL` dir are dead to every future read and are
  * pruned by the NEXT batch (never by the compacting batch itself: its
  * own replay still needs them until its checkpoint commits).
  *
  * Crash contract: every write lands in a `batch_<id>` subdirectory
  * with mode=overwrite, so a replayed micro-batch rewrites exactly its
  * own output (including the compaction decision — deterministic from
  * the surviving generation count); the state read EXCLUDES the
  * replaying batch's own dir (a crash between the state write and the
  * checkpoint commit would otherwise feed the batch its own digests as
  * "old" state and turn every batch document fully span-covered), and
  * pruning only ever removes dirs below a committed `_FULL` generation,
  * which no read — replay or live — can need again.
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
      n: Int = 8,
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          import spark.implicits._
          val docs = batch.select(col("doc_id"), col("text"))
          // replay guard: never read this batch's own digests as state;
          // dirs below the newest committed _FULL generation are dead to
          // every future read (full ⊇ them) — prune them now, BEFORE this
          // batch's own state write, so a crash mid-prune costs nothing
          val (live, dead) = FileQueue.liveGenerations(spark, stateDir, batchId)
          FileQueue.deleteGenerations(spark, dead)
          val state =
            if (live.nonEmpty) spark.read.parquet(live: _*)
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
            val delta = Dedup.spanDigestState(docs, col("doc_id"), col("text"), n)
              .join(state, Seq("dg"), "left_anti")
            val out = s"$stateDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              // compact: this generation carries the WHOLE distinct
              // digest set; the marker lands after the parquet commit,
              // so a half-written compaction is read as a plain delta
              // only by this batch's own replay — which overwrites it
              state.select("dg").unionByName(delta.select("dg"))
                .write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              delta.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
