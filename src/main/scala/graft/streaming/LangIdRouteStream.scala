package graft.streaming

import graft.operators.{CacheScope, LangId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming LANGUAGE ROUTING at ingestion — the first stage of a
  * CCNet-shaped multilingual pipeline: every arriving document is
  * scored under a FROZEN corpus-trained lang-ID model
  * ([[LangId.score]]) and lands in its predicted language's partition,
  * so each downstream per-language pipeline (LM filter, dedup,
  * tokenizer) consumes only its own stream. Per micro-batch of
  * `(doc_id, text)` records:
  *
  *  - scoreable documents land in `outDir/lang=<predicted>/batch_<id>`
  *    with their per-class scores (observability — the margin audit a
  *    router needs);
  *  - UNSCOREABLE documents (null text — the scorer emits no row)
  *    land in `rejectsDir/batch_<id>` with reason `null_text`: a
  *    router cannot vouch for what it cannot read (the
  *    every-input-routes-somewhere invariant).
  *
  * NO growing state — routing is stateless per document; per-batch
  * cost is one feature pass + a broadcast join against the
  * `L·(dim+1)`-row model. The MODEL is state: the weight table, its
  * `(n, dim)` geometry, and the class list freeze into `stateDir` on
  * the first batch (digest-stamped ONCE at `start()`), and a restart
  * passing a different model, geometry, or language set fails loudly
  * instead of silently re-partitioning the stream — a drifted router
  * sends the same document to a different language pipeline. */
object LangIdRouteStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      outDir: String,
      rejectsDir: String,
      checkpointDir: String,
      weights: DataFrame,
      langs: Seq[String],
      n: Int,
      dim: Int,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(langs.nonEmpty, "LangIdRouteStream: langs must be non-empty")
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    val ls = langs.sorted
    val modelDir = s"$stateDir/model"
    val metaDir = s"$stateDir/meta"
    // order-free content digest of a (lang, b, w) table
    def digestOf(m: DataFrame): Long =
      m.agg(expr("bit_xor(xxhash64(lang, b, w))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    // fixed per start() call — one model-sized scan total, not per batch
    val passedDigest = digestOf(weights)
    val passedLangs = ls.mkString(",")
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
              Seq((n, dim, passedLangs, digestOf(spark.read.parquet(modelDir))))
                .toDF("n", "dim", "langs", "model_digest")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == n && meta.getInt(1) == dim &&
                meta.getString(2) == passedLangs &&
                meta.getLong(3) == passedDigest,
              s"LangIdRouteStream: router frozen with n=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)} langs=${meta.getString(2)} " +
                s"modelDigest=${meta.getLong(3)}, probed with n=$n dim=$dim " +
                s"langs=$passedLangs modelDigest=$passedDigest — a drifted " +
                "router re-partitions the language streams; rebuild instead")
            val frozen = spark.read.parquet(modelDir)
            val docs = scope.pin(batch.select(col("doc_id"), col("text")))
            val scored = scope.pin(docs.join(
              LangId.score(docs, col("doc_id"), col("text"), frozen, ls, n, dim)
                .withColumnRenamed("id", "doc_id"),
              Seq("doc_id"), "left"))
            ls.foreach { l =>
              scored.filter(col("predicted_lang") === l)
                .write.mode("overwrite").parquet(s"$outDir/lang=$l/batch_$batchId")
            }
            scored.filter(col("predicted_lang").isNull)
              .select(col("doc_id"), col("text"), lit("null_text").as("reason"))
              .write.mode("overwrite").parquet(s"$rejectsDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
