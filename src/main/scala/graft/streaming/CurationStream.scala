package graft.streaming

import graft.operators.{CacheScope, NgramLm, QualityClassifier, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming TEXT-CURATION filter chain at INGESTION — the
  * q_curation_pipeline filter stages (heuristic gates → learned
  * classifier screen → reference-LM surprisal cut) run per arriving
  * micro-batch, completing the curation family's streaming matrix
  * (dedup and the domain cap already stream via [[DedupStream]] /
  * [[DomainCapStream]]; production chains this screen in front of
  * them). Per micro-batch of `(doc_id, text)` records:
  *
  *  - UNSCOREABLE documents (null text) route to `rejectDir` with
  *    reason `unscoreable` FIRST — none of the three screens can
  *    vouch for what it cannot read (the [[ClassifierFilterStream]]
  *    discipline);
  *  - gate failures ([[TextStats.withGateFlags]] conjunction false)
  *    route with reason `gate_fail`;
  *  - classifier-flagged documents (frozen model score > 0 — the
  *    batch flagship's decontamination polarity: the planted
  *    reference domain is EXCLUDED) route with reason `clf_flagged`;
  *  - high-surprisal documents (frozen pruned-LM mean scaled
  *    surprisal above `maxSurprisal`, and documents with NO scoreable
  *    window — zero tokens — which a perplexity filter cannot vouch
  *    for either) route with reason `lm_above_threshold` /
  *    `lm_unscoreable`;
  *  - survivors land in `admitDir/batch_<id>` with their score and
  *    surprisal (the observability columns).
  *
  * Every input row routes EXACTLY once (admit + reject partition the
  * batch — the ADVICE r14 invariant this family maintains). NO growing
  * state: all three screens are stateless per document. The MODELS are
  * state: the classifier weight table, the pruned LM count table, the
  * geometry `(n, dim, order)`, and the threshold freeze into
  * `stateDir` on the first batch (digests computed ONCE at `start()`
  * — one model-sized scan per call, not per batch), and a restart
  * passing a different model, geometry, or cut fails loudly instead of
  * silently re-partitioning the stream mid-corpus.
  *
  * Unlike the batch flagship's survivor-MEAN cut (a distribution-
  * relative threshold needs the whole distribution), the streaming cut
  * is a FROZEN constant — a stream cannot see future arrivals, so
  * production freezes the quantile measured on a calibration corpus;
  * `maxSurprisal` is that artifact.
  *
  * Scale shape per batch: one narrow gate pass, one `fnv_ngrams`
  * feature aggregate + broadcast join against the dim+1-row weights,
  * one 5-gram join ladder against the pruned tables — all linear in
  * the batch, nothing corpus-wide. */
object CurationStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      admitDir: String,
      rejectDir: String,
      checkpointDir: String,
      clfWeights: DataFrame,
      n: Int,
      dim: Int,
      lmModel: DataFrame,
      order: Int,
      maxSurprisal: Long,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    val clfDir = s"$stateDir/clf_model"
    val lmDir = s"$stateDir/lm_model"
    val metaDir = s"$stateDir/meta"
    // order-free content digests (the ClassifierFilterStream spelling)
    def clfDigest(m: DataFrame): Long =
      m.agg(expr("bit_xor(xxhash64(b, w))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    def lmDigest(m: DataFrame): Long =
      m.agg(expr("bit_xor(xxhash64(len, gram, n))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // fixed per start() call — one scan per model total, not per batch
    val passedClf = clfDigest(clfWeights)
    val passedLm = lmDigest(lmModel)
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              clfWeights.write.mode("overwrite").parquet(clfDir)
              lmModel.write.mode("overwrite").parquet(lmDir)
              Seq((n, dim, order, maxSurprisal,
                  clfDigest(spark.read.parquet(clfDir)),
                  lmDigest(spark.read.parquet(lmDir))))
                .toDF("n", "dim", "order", "max_surprisal",
                  "clf_digest", "lm_digest")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == n && meta.getInt(1) == dim &&
                meta.getInt(2) == order && meta.getLong(3) == maxSurprisal &&
                meta.getLong(4) == passedClf && meta.getLong(5) == passedLm,
              s"CurationStream: screen frozen with n=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)} order=${meta.getInt(2)} " +
                s"maxSurprisal=${meta.getLong(3)} clfDigest=${meta.getLong(4)} " +
                s"lmDigest=${meta.getLong(5)}, probed with n=$n dim=$dim " +
                s"order=$order maxSurprisal=$maxSurprisal clfDigest=$passedClf " +
                s"lmDigest=$passedLm — a drifted screen partitions the stream " +
                "inconsistently; rebuild the filter instead")
            val frozenClf = spark.read.parquet(clfDir)
            val frozenLm = spark.read.parquet(lmDir)
            val docs = scope.pin(batch.select(col("doc_id"), col("text")))
            val scoreable = docs.filter(col("text").isNotNull)
            // every screen's verdict joined back onto the batch — the
            // reason CASE below is the single routing decision, so a
            // row cannot land in two outputs or in none
            val gated = TextStats.withGateFlags(scoreable, col("text"))
              .select(col("doc_id"), col("keep").as("__gate"))
            val clf = QualityClassifier.score(scoreable, col("doc_id"),
                col("text"), frozenClf, n, dim)
              .select(col("id").as("doc_id"), col("score"))
            val lm = NgramLm.scoreBackoffPruned(scoreable, col("doc_id"),
                col("text"), frozenLm, order, scope)
              .select(col("id").as("doc_id"), col("avg_surprisal"))
            val routed = scope.pin(docs
              .join(gated, Seq("doc_id"), "left")
              .join(clf, Seq("doc_id"), "left")
              .join(lm, Seq("doc_id"), "left")
              .withColumn("reason",
                when(col("text").isNull, "unscoreable")
                  .when(!col("__gate"), "gate_fail")
                  .when(col("score") > 0, "clf_flagged")
                  .when(col("avg_surprisal").isNull, "lm_unscoreable")
                  .when(col("avg_surprisal") > maxSurprisal, "lm_above_threshold")
                  .otherwise("admit"))
              .drop("__gate"))
            routed.filter(col("reason") === "admit")
              .select(col("doc_id"), col("text"), col("score"), col("avg_surprisal"))
              .write.mode("overwrite").parquet(s"$admitDir/batch_$batchId")
            routed.filter(col("reason") =!= "admit")
              .write.mode("overwrite").parquet(s"$rejectDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
