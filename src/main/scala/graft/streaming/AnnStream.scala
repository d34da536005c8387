package graft.streaming

import graft.operators.{CacheScope, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming embedding-ANN index at INGESTION — the composition
  * [[Similarity.incrementalBandedPairs]] exists for, run as a
  * Structured Streaming job over the bronze file queue (the
  * [[FuzzyStream]] discipline on the cosine metric):
  *
  * per micro-batch of `(vec_id, embedding)` records:
  *   1. cosine-scored candidate pairs TOUCHING the batch — new×new
  *      (blocked band self-join) plus new×STATE (a probe against the
  *      persisted band index; old×old never re-pairs, per-batch cost
  *      stays flat as the index grows) — land in `pairsDir/batch_<id>`;
  *   2. the batch's own [[Similarity.bandAssignments]] rows append to
  *      the band index as `stateDir/bands/batch_<id>`, and its prepped
  *      vectors (the scoring payload candidates join back to) as
  *      `stateDir/vecs/batch_<id>`.
  *
  * THE FROZEN WIDTH: band co-bucketing needs every generation signed
  * at ONE width ([[Similarity.bandAssignments]]' state property —
  * bands at different widths never co-bucket, a silent recall hole),
  * so the FIRST batch freezes `width = adaptiveBits(count, minWidth)`
  * into `stateDir/meta` and every batch — including a replay of the
  * first (the table is deterministic from batch 0's data) — bands
  * under it. The stamp also carries `bands` and `dim`; a caller
  * probing with mismatched params fails loudly instead of silently
  * missing pairs (the EditDist state-stamp discipline). As the corpus
  * doubles past the next power of two the frozen width's buckets
  * crowd — the usual re-freeze-on-rebuild trade-off of any persisted
  * index statistics (exactness never degrades: scoring is exact
  * quantized cosine on every candidate).
  *
  * State compaction: every `compactEvery` live generations the batch
  * folds prior band and vector generations plus its own rows into one
  * `_FULL`-marked dir per store ([[FileQueue.liveGenerations]]
  * discipline — vec ids are disjoint across batches, so the fold is a
  * plain union); dead deltas are pruned by the NEXT batch. Per-trigger
  * state cost is one clustered dir plus at most `compactEvery` deltas
  * per store, flat in stream lifetime.
  *
  * Crash contract: every write lands in a `batch_<id>` subdirectory
  * with mode=overwrite, and the state read EXCLUDES the replaying
  * batch's own dirs — a crash between the state write and the
  * checkpoint commit never feeds a batch its own bands as "old" state
  * (which would emit self-pairs at cosine 1). */
object AnnStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      dim: Int,
      trigger: Trigger = Trigger.AvailableNow(),
      bands: Int = 4,
      minWidth: Int = 4,
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val bandsDir = s"$stateDir/bands"
    val vecsDir = s"$stateDir/vecs"
    val metaDir = s"$stateDir/meta"
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            // pinned: feeds the banding, the pair scoring, and the state write
            val newPrepped = scope.pin(Similarity.prep(
              batch.select(col("vec_id"), col("embedding")), col("vec_id"), col("embedding")))
            val (liveB, deadB) = FileQueue.liveGenerations(spark, bandsDir, batchId)
            val (liveV, deadV) = FileQueue.liveGenerations(spark, vecsDir, batchId)
            FileQueue.deleteGenerations(spark, deadB ++ deadV)
            // freeze the width on the FIRST generation (no prior state);
            // a replay of that batch recreates the same one-row table
            if (liveB.isEmpty) {
              import spark.implicits._
              Seq((bands, Similarity.adaptiveBits(newPrepped.count(), minWidth), dim))
                .toDF("bands", "width", "dim")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == bands && meta.getInt(2) == dim,
              s"AnnStream: state built with bands=${meta.getInt(0)} dim=${meta.getInt(2)}, " +
                s"probed with bands=$bands dim=$dim — rebuild the index instead")
            val width = meta.getInt(1)
            val own = scope.pin(Similarity.bandAssignments(newPrepped, dim, bands, width))
            val stateBanded =
              if (liveB.nonEmpty) spark.read.parquet(liveB: _*)
              else own.limit(0) // schema-shaped empty state
            val oldPrepped =
              if (liveV.nonEmpty) spark.read.parquet(liveV: _*)
              else newPrepped.limit(0)
            Similarity.incrementalBandedPairs(newPrepped, oldPrepped, stateBanded,
                dim, bands, width, scope = scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            val outB = s"$bandsDir/batch_$batchId"
            val outV = s"$vecsDir/batch_$batchId"
            if (liveB.size + 1 >= compactEvery) {
              stateBanded.unionByName(own).write.mode("overwrite").parquet(outB)
              oldPrepped.unionByName(newPrepped).write.mode("overwrite").parquet(outV)
              FileQueue.markFull(spark, outB)
              FileQueue.markFull(spark, outV)
            } else {
              own.write.mode("overwrite").parquet(outB)
              newPrepped.write.mode("overwrite").parquet(outV)
            }
          } finally scope.close()
        }
    }
  }
}
