package graft.streaming

import graft.operators.{CacheScope, QualityClassifier}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming LEARNED-classifier quality filtering at INGESTION — the
  * [[LmFilterStream]] discipline with the trained linear model in
  * place of the reference LM (production pipelines run both: the
  * GPT-3/CCNet learned filter screens each arriving document against
  * a FROZEN classifier): per micro-batch of `(doc_id, text)` records,
  * [[QualityClassifier.score]] computes the integer dot product
  * against the frozen weight table and splits:
  *
  *  - keepers (`score > 0`, the perceptron decision) land in
  *    `passDir/batch_<id>` with their score (observability);
  *  - rejected documents land in `dropDir/batch_<id>`;
  *  - UNSCOREABLE documents (null text — the scorer emits no row)
  *    also land in `dropDir` with a null score: a quality filter
  *    cannot vouch for what it cannot score.
  *
  * NO growing state — the screen is stateless per document; per-batch
  * cost is one feature pass + a broadcast join against the `dim+1`-row
  * weight table. The MODEL is state: weights and `(n, dim)` freeze
  * into `stateDir` on the first batch (digest-stamped ONCE at
  * `start()` — the model is fixed per call), and a restart passing a
  * different model or geometry fails loudly instead of silently
  * re-partitioning the stream. */
object ClassifierFilterStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      passDir: String,
      dropDir: String,
      checkpointDir: String,
      weights: DataFrame,
      n: Int,
      dim: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    val modelDir = s"$stateDir/model"
    val metaDir = s"$stateDir/meta"
    // order-free content digest of a (b, w) weight table
    def digestOf(m: DataFrame): Long =
      m.agg(expr("bit_xor(xxhash64(b, w))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // fixed per start() call — one model-sized scan total, not per batch
    val passedDigest = digestOf(weights)
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              weights.write.mode("overwrite").parquet(modelDir)
              Seq((n, dim, digestOf(spark.read.parquet(modelDir))))
                .toDF("n", "dim", "model_digest")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == n && meta.getInt(1) == dim &&
                meta.getLong(2) == passedDigest,
              s"ClassifierFilterStream: filter frozen with n=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)} modelDigest=${meta.getLong(2)}, probed " +
                s"with n=$n dim=$dim modelDigest=$passedDigest — a drifted " +
                "classifier partitions the stream inconsistently; rebuild the " +
                "filter instead")
            val frozen = spark.read.parquet(modelDir)
            val docs = scope.pin(batch.select(col("doc_id"), col("text")))
            // scored feeds both halves; unscored rows (null-text docs)
            // surface through the left join as null scores
            val routed = scope.pin(docs.join(
              QualityClassifier.score(docs, col("doc_id"), col("text"),
                  frozen, n, dim)
                .withColumnRenamed("id", "doc_id"),
              Seq("doc_id"), "left"))
            routed.filter(col("keep") === 1)
              .write.mode("overwrite").parquet(s"$passDir/batch_$batchId")
            routed.filter(col("keep").isNull || col("keep") =!= 1)
              .write.mode("overwrite").parquet(s"$dropDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
