package graft.streaming

import graft.operators.{CacheScope, QualityClassifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CLASSIFIER TRAINING at INGESTION — the label-feedback
  * loop of a learned quality filter (production pipelines re-fit the
  * fastText-style model as curated/rejected examples accumulate):
  * per micro-batch of `(doc_id, text, y)` records with `y ∈ {+1, −1}`,
  *
  *  1. the batch's class occurrence counts
  *     ([[QualityClassifier.rateCounts]] — the rate model's ADDITIVE
  *     state) append to the persisted ledger as
  *     `stateDir/counts/batch_<id>`;
  *  2. the CURRENT model — [[QualityClassifier.weightsFromCounts]]
  *     over the folded ledger INCLUDING this batch — lands in
  *     `modelDir/batch_<id>`: every generation is a complete,
  *     immediately-deployable `(b, w)` table (what a
  *     [[ClassifierFilterStream]] restart would freeze).
  *
  * Counts are additive, so the generation-k model EQUALS direct
  * [[QualityClassifier.trainRates]] over the union of all batches so
  * far — the spec's parity trial. Geometry `(n, dim)` freezes into
  * `stateDir/meta` on the first batch (buckets hashed under a
  * different dim are incomparable; a drifted restart fails loudly).
  * Compaction and crash contract are [[MediaStream]]'s: `_FULL` fold
  * every `compactEvery` generations; state reads EXCLUDE the replaying
  * batch's own generation, so a crash between the ledger write and the
  * checkpoint commit never double-counts a batch's occurrences. */
object ClfTrainStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      modelDir: String,
      checkpointDir: String,
      n: Int,
      dim: Int,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    val countsDir = s"$stateDir/counts"
    val metaDir = s"$stateDir/meta"
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              Seq((n, dim)).toDF("n", "dim").write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == n && meta.getInt(1) == dim,
              s"ClfTrainStream: ledger built with n=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)}, probed with n=$n dim=$dim — buckets " +
                "hashed under a different geometry are incomparable; rebuild " +
                "the ledger instead")
            // the batch's additive count delta (one aggregate pass)
            val delta = scope.pin(QualityClassifier.rateCounts(
              batch, col("doc_id"), col("text"), col("y"), n, dim))
            val (live, dead) = FileQueue.liveGenerations(spark, countsDir, batchId)
            FileQueue.deleteGenerations(spark, dead)
            val folded = scope.pin(
              if (live.isEmpty) delta
              else spark.read.parquet(live: _*).unionByName(delta)
                .groupBy("b").agg(sum("n_pos").as("n_pos"), sum("n_neg").as("n_neg")))
            // a complete deployable model per generation
            QualityClassifier.weightsFromCounts(folded, scope)
              .write.mode("overwrite").parquet(s"$modelDir/batch_$batchId")
            val out = s"$countsDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              folded.write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              delta.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
