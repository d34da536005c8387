package graft.streaming

import graft.operators.{CacheScope, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming near-dup dedup at INGESTION — the composition
  * [[Dedup.incrementalCandidates]] exists for, run as a Structured
  * Streaming job over the bronze file queue:
  *
  * per micro-batch of documents:
  *   1. the batch's text lands in the corpus store (the silver table
  *      the pipeline owns anyway);
  *   2. per-doc MinHash bands are computed (corpus-independent, so
  *      batch-local work only);
  *   3. candidates = batch×batch (blocked self-join) plus batch×STATE
  *      (probe join against the persisted band table — old×old never
  *      pairs, per-batch cost stays flat as history grows);
  *   4. exact-Jaccard verification reads ONLY candidate documents from
  *      the corpus store (broadcast semi-join by id);
  *   5. verified pairs and the batch's bands append to their tables.
  *
  * The band-state table holds (id, band_idx, band_val) — k/bandWidth
  * small rows per document, tiny next to the text — and IS the dedup
  * index a 100 TB ingestion pipeline persists.
  *
  * Crash contract: every write lands in a `batch_<id>` subdirectory
  * with mode=overwrite, so a replayed micro-batch rewrites exactly its
  * own output — pairs, bands, and corpus stay duplicate-free without
  * read-side dedup (the EtlPipeline chunked-write pattern).
  */
object DedupStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      corpusDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      k: Int = 8,
      bandWidth: Int = 2,
      shingleN: Int = 3,
      threshold: Double = 0.6): StreamingQuery =
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val docs = batch.select(col("doc_id"), col("text"))
          docs.write.mode("overwrite").parquet(s"$corpusDir/batch_$batchId")
          // batch-owned scope for every pin this batch creates (the
          // bands frame, jaccardVerify's candidate-shingle set) — a
          // long-running stream must not accumulate one cache entry per
          // micro-batch
          val scope = new CacheScope
          try {
            // the batch is read twice (bands + the corpus write above)
            // and the bands thrice (self-pairs gate, probe, state write)
            val bands = scope.pin(Dedup.lshBands(
              Dedup.minhashSignatureArr(docs, col("doc_id"), col("text"), shingleN, k),
              k, bandWidth))
            // CRASH-REPLAY GUARD: a crash between this batch's state write
            // and the checkpoint commit replays the batch with its OWN
            // bands already persisted — reading them back as "old" state
            // would violate incrementalCandidates' disjoint-id contract
            // and emit self-pairs. Exclude batch_<id> explicitly, so a
            // replay sees exactly the state the original run saw.
            val priorState: Seq[String] = FileQueue.batchDirs(spark, stateDir)
              .filter(_._1 != batchId).map(_._2)
            val cands =
              if (priorState.nonEmpty)
                Dedup.incrementalCandidates(bands, spark.read.parquet(priorState: _*))
              else Dedup.candidatePairs(bands)
            // verification text comes from the corpus store (batch
            // included — written first), confined to candidate ids
            val candIds = cands.select(col("id_a").as("doc_id"))
              .union(cands.select(col("id_b").as("doc_id"))).distinct()
            val candDocs = spark.read.parquet(s"$corpusDir/*")
              .join(broadcast(candIds), Seq("doc_id"), "left_semi")
            Dedup.jaccardVerify(cands,
                Dedup.shinglesRaw(candDocs, col("doc_id"), col("text"), shingleN), threshold,
                scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            bands.write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
          } finally scope.close()
        }
    }
}
