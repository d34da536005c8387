package graft.streaming

import graft.operators.{CacheScope, NgramLm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming LM QUALITY FILTERING at INGESTION — the CCNet/Gopher
  * perplexity filter where it actually runs in production (each
  * arriving document scored against a FROZEN reference LM, pruned or
  * not, and routed): per micro-batch of `(doc_id, text)` records,
  * [[NgramLm.scoreBackoffPruned]] scores the batch against the frozen
  * per-order artifact and splits:
  *
  *  - keepers (`avg_surprisal ≤ maxAvgSurprisal`) land in
  *    `passDir/batch_<id>` with their score (observability);
  *  - out-of-domain documents land in `dropDir/batch_<id>`;
  *  - UNSCOREABLE documents (no tokens — the scorer emits no row)
  *    also land in `dropDir` with a null score: a quality filter
  *    cannot vouch for what it cannot score, and silently passing
  *    them would launder empty payloads into the corpus.
  *
  * Like [[DecontaminateStream]] there is NO growing state — the
  * screen is stateless per document, per-batch cost one scoring pass
  * regardless of history. The MODEL is state: the artifact and
  * `(order, threshold)` freeze into `stateDir` on the first batch
  * (digest-stamped), every batch scores against the FROZEN copy, and
  * a restart passing a different model or params fails loudly instead
  * of silently re-partitioning the stream. */
object LmFilterStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      passDir: String,
      dropDir: String,
      checkpointDir: String,
      model: DataFrame,
      order: Int,
      maxAvgSurprisal: Long,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val modelDir = s"$stateDir/model"
    val metaDir = s"$stateDir/meta"
    // order-free content digest of a (len, gram, n) artifact
    def digestOf(m: DataFrame): Long =
      m.agg(expr("bit_xor(xxhash64(len, gram, n))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // the passed model is FIXED per start() call — digest it ONCE here,
    // not per micro-batch (ADVICE r13: a per-batch digestOf(model) is a
    // model-sized scan per batch, contradicting the "one scoring pass"
    // cost contract at web-scale artifact sizes)
    val passedDigest = digestOf(model)
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              model.write.mode("overwrite").parquet(modelDir)
              Seq((order, maxAvgSurprisal, digestOf(spark.read.parquet(modelDir))))
                .toDF("order", "threshold", "model_digest")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == order && meta.getLong(1) == maxAvgSurprisal &&
                meta.getLong(2) == passedDigest,
              s"LmFilterStream: filter frozen with order=${meta.getInt(0)} " +
                s"threshold=${meta.getLong(1)} modelDigest=${meta.getLong(2)}, probed " +
                s"with order=$order threshold=$maxAvgSurprisal modelDigest=$passedDigest " +
                "— a drifted reference LM partitions the stream inconsistently; " +
                "rebuild the filter instead")
            val frozen = spark.read.parquet(modelDir)
            val docs = scope.pin(batch.select(col("doc_id"), col("text")))
            // scored feeds both halves; unscored rows (no-token docs)
            // surface through the left join as null scores
            val routed = scope.pin(docs.join(
              NgramLm.scoreBackoffPruned(docs, col("doc_id"), col("text"),
                  frozen, order, scope)
                .withColumnRenamed("id", "doc_id"),
              Seq("doc_id"), "left"))
            routed.filter(col("avg_surprisal") <= maxAvgSurprisal)
              .write.mode("overwrite").parquet(s"$passDir/batch_$batchId")
            routed.filter(col("avg_surprisal").isNull ||
                col("avg_surprisal") > maxAvgSurprisal)
              .write.mode("overwrite").parquet(s"$dropDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
