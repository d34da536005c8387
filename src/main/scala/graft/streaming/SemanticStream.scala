package graft.streaming

import graft.operators.{CacheScope, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming SEMANTIC (SemDeDup-style) near-dup detection at INGESTION
  * — the composition [[Similarity.incrementalSemanticPairs]] exists
  * for, run as a Structured Streaming job over the bronze file queue
  * (the [[AnnStream]] discipline on the cell metric):
  *
  * per micro-batch of `(vec_id, embedding)` records:
  *   1. within-cell cosine pairs TOUCHING the batch — new×new (blocked
  *      triangular self-pairing) plus new×STATE (grid-blocked cross
  *      probe; old×old never re-pairs, per-batch cost stays flat as
  *      the corpus grows) — land in `pairsDir/batch_<id>`;
  *   2. the batch's `(id, q, norm, cell)` assignments append to the
  *      cell index as `stateDir/cells/batch_<id>`.
  *
  * THE FROZEN CENTROIDS: cell identity is a state property — vectors
  * assigned under different centroid models never co-cell (the
  * [[AnnStream]] frozen-width rule on the cell metric) — so the FIRST
  * batch freezes its stride-centroid table into `stateDir/centroids`
  * (deterministic from batch 0's data, so a replay rewrite is
  * byte-stable) and every batch assigns map-side against it. A
  * `meta` stamp carries `(stride, dim, threshold)`; probing with
  * mismatched params fails loudly. As the corpus drifts from batch
  * 0's distribution the frozen cells blur — the usual
  * re-freeze-on-rebuild trade-off of persisted index statistics
  * (recall is the approximate knob here exactly as in batch SemDeDup;
  * scoring stays exact quantized cosine on every candidate).
  *
  * State compaction and crash contract: identical to [[AnnStream]] —
  * `_FULL` fold every `compactEvery` generations, dead deltas pruned
  * by the next batch, state reads EXCLUDE the replaying batch's own
  * dir (a crash between state write and checkpoint commit never feeds
  * a batch its own cells — which would emit cosine-1 self-pairs). */
object SemanticStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      dim: Int,
      threshold: Double,
      trigger: Trigger = Trigger.AvailableNow(),
      stride: Int = 31,
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val cellsDir = s"$stateDir/cells"
    val centDir = s"$stateDir/centroids"
    val metaDir = s"$stateDir/meta"
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val newPrepped = scope.pin(Similarity.prep(
              batch.select(col("vec_id"), col("embedding")), col("vec_id"), col("embedding")))
            val (live, dead) = FileQueue.liveGenerations(spark, cellsDir, batchId)
            FileQueue.deleteGenerations(spark, dead)
            if (live.isEmpty) {
              // freeze centroids + params on the FIRST generation
              Similarity.strideCentroids(newPrepped, stride)
                .write.mode("overwrite").parquet(centDir)
              import spark.implicits._
              Seq((stride, dim, threshold)).toDF("stride", "dim", "threshold")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == stride && meta.getInt(1) == dim &&
                meta.getDouble(2) == threshold,
              s"SemanticStream: state built with stride=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)} threshold=${meta.getDouble(2)}, probed with " +
                s"stride=$stride dim=$dim threshold=$threshold — rebuild the index instead")
            val model = spark.read.parquet(centDir)
              .select(col("cent_id"), col("cq")).collect()
              .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
            val own = scope.pin(newPrepped.withColumn("cell",
              Similarity.cellAssignExpr(model, col("q"), col("norm"))))
            val stateCells =
              if (live.nonEmpty) spark.read.parquet(live: _*)
              else own.limit(0)
            Similarity.incrementalSemanticPairs(newPrepped, stateCells, model,
                threshold, scope = scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            val out = s"$cellsDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              stateCells.unionByName(own).write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              own.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
