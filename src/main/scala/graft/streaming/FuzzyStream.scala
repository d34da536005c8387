package graft.streaming

import graft.operators.{CacheScope, EditDist}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming fuzzy entity matching at INGESTION — the composition
  * [[EditDist.incrementalSimilarPairs]] exists for, run as a Structured
  * Streaming job over the bronze file queue (the [[DedupStream]]
  * pattern on the edit-distance metric):
  *
  * per micro-batch of `(id, name)` records:
  *   1. within-`maxDist` pairs TOUCHING the batch — batch×batch plus
  *      batch×STATE (a probe against the persisted prefix-gram index;
  *      old×old never re-pairs, per-batch cost stays flat as history
  *      grows) — land in `pairsDir/batch_<id>`;
  *   2. the batch's own [[EditDist.gramStateUnder]] rows append to the
  *      gram index as `stateDir/grams/batch_<id>`.
  *
  * THE FROZEN ORDER: the prefix lemma needs every generation's prefixes
  * chosen under ONE shared total order, so the FIRST batch writes its
  * gram-frequency table to `stateDir/freq` once and every batch —
  * including the first — selects prefixes under it (unseen grams rank
  * first at frequency 0: still shared, still total, so exactness never
  * degrades; only bucket-size quality drifts as the corpus moves away
  * from the frozen frequencies, the usual re-freeze-on-rebuild
  * trade-off of any persisted index statistics).
  *
  * State compaction: every `compactEvery` live generations the batch
  * folds prior gram generations plus its own rows into one
  * `_FULL`-marked dir ([[FileQueue.liveGenerations]] discipline — ids
  * are disjoint across batches, so the fold is a plain union); dead
  * deltas are pruned by the NEXT batch. Per-trigger state cost is one
  * clustered dir plus at most `compactEvery` deltas, flat in stream
  * lifetime.
  *
  * Crash contract: every write lands in a `batch_<id>` subdirectory
  * with mode=overwrite (the freq table is deterministic from batch 0's
  * data, so its replay rewrite is byte-stable); the state read EXCLUDES
  * the replaying batch's own dir, so a crash between the state write
  * and the checkpoint commit never feeds a batch its own grams as "old"
  * state.
  */
object FuzzyStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxDist: Int = 1,
      q: Int = 2,
      maxShortPool: Long = 100000L,
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val gramsDir = s"$stateDir/grams"
    val freqDir = s"$stateDir/freq"
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val recs = batch.select(col("id"), col("name"))
          val (live, dead) = FileQueue.liveGenerations(spark, gramsDir, batchId)
          FileQueue.deleteGenerations(spark, dead)
          // freeze the order on the FIRST generation (no prior state);
          // a replay of that batch recreates the same table
          if (live.isEmpty)
            EditDist.gramFreqState(recs, col("id"), col("name"), maxDist, q)
              .write.mode("overwrite").parquet(freqDir)
          val freq = spark.read.parquet(freqDir)
          val scope = new CacheScope
          try {
            val own = scope.pin(EditDist.gramStateUnder(
              recs, col("id"), col("name"), freq, maxDist, q))
            val state =
              if (live.nonEmpty) spark.read.parquet(live: _*)
              else own.limit(0) // schema-shaped empty state
            EditDist.incrementalSimilarPairs(recs, col("id"), col("name"),
                state, freq, maxDist, q, maxShortPool, scope = scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            val out = s"$gramsDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              state.unionByName(own).write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              own.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
