package graft.streaming

import graft.operators.{CacheScope, LangId, NgramLm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming MULTILINGUAL CURATION at ingestion — the composed CCNet
  * front door (VERDICT r17 item 2): every arriving document is ROUTED
  * under the frozen corpus-trained lang-ID model and then LM-FILTERED
  * against ITS language's frozen reference bigram LM at that
  * language's frozen surprisal cut, in one micro-batch pass. This is
  * [[LangIdRouteStream]] ∘ [[LmFilterStream]] with the per-language
  * keyed members ([[NgramLm.scoreBy]]) doing the fan-out — one scoring
  * join against the keyed model instead of L separate filter streams.
  *
  * Per micro-batch of `(doc_id, text)` records, per-reason routing
  * (the CurationStream discipline — every input lands somewhere):
  *
  *  - KEEPERS (`avg_surprisal ≤` their language's cut) land in
  *    `outDir/lang=<predicted>/batch_<id>` with their score;
  *  - `lm_fail` documents (scored above their language's cut) land in
  *    `rejectsDir/batch_<id>` with the score that convicted them;
  *  - `null_text` documents (the router emits no row) are rejected —
  *    a router cannot vouch for what it cannot read;
  *  - `uncovered_lang` documents (routed to a language the frozen CUT
  *    table has no row for) are rejected — the
  *    [[NgramLm.scoreBy]] uncovered-key contract (ADVICE r17) made
  *    operational: a missing language surfaces as an explicit reason,
  *    never a silent drop or a fake pass;
  *  - `unscoreable` documents (routed and covered, but no bigram to
  *    score — single-token text) are rejected: a quality filter
  *    cannot vouch for what it cannot score.
  *
  * NO growing state — routing and scoring are stateless per document;
  * per-batch cost is one feature pass, one broadcast router join, one
  * keyed model join. The MODELS are state: router weights, the keyed
  * LM, the per-language cuts, and the `(n, dim, langs)` geometry all
  * freeze into `stateDir` on the first batch (digest-stamped ONCE at
  * `start()`), and a restart passing ANY drifted artifact fails
  * loudly naming the frozen-vs-probed values — a drifted router
  * re-partitions the language streams, a drifted LM or cut
  * re-partitions pass/fail. */
object MultilingualCurationStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      outDir: String,
      rejectsDir: String,
      checkpointDir: String,
      routerWeights: DataFrame,
      langs: Seq[String],
      n: Int,
      dim: Int,
      lmModel: DataFrame,
      cuts: DataFrame,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(langs.nonEmpty, "MultilingualCurationStream: langs must be non-empty")
    graft.GraftFunctions.ensure(spark) // fnv_ngrams
    val ls = langs.sorted
    val routerDir = s"$stateDir/router"
    val lmDir = s"$stateDir/lm"
    val cutsDir = s"$stateDir/cuts"
    val metaDir = s"$stateDir/meta"
    // order-free content digests (one model-sized scan each, at start())
    def dig(df: DataFrame, cols: String*): Long =
      df.agg(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))")).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val passedRouter = dig(routerWeights, "lang", "b", "w")
    val passedLm = dig(lmModel, "k", "w1", "w2", "n")
    val passedCuts = dig(cuts, "k", "max_avg_surprisal")
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
              routerWeights.write.mode("overwrite").parquet(routerDir)
              lmModel.write.mode("overwrite").parquet(lmDir)
              cuts.write.mode("overwrite").parquet(cutsDir)
              Seq((n, dim, passedLangs,
                  dig(spark.read.parquet(routerDir), "lang", "b", "w"),
                  dig(spark.read.parquet(lmDir), "k", "w1", "w2", "n"),
                  dig(spark.read.parquet(cutsDir), "k", "max_avg_surprisal")))
                .toDF("n", "dim", "langs", "router_digest", "lm_digest", "cuts_digest")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == n && meta.getInt(1) == dim &&
                meta.getString(2) == passedLangs &&
                meta.getLong(3) == passedRouter &&
                meta.getLong(4) == passedLm &&
                meta.getLong(5) == passedCuts,
              s"MultilingualCurationStream: frozen with n=${meta.getInt(0)} " +
                s"dim=${meta.getInt(1)} langs=${meta.getString(2)} " +
                s"routerDigest=${meta.getLong(3)} lmDigest=${meta.getLong(4)} " +
                s"cutsDigest=${meta.getLong(5)}, probed with n=$n dim=$dim " +
                s"langs=$passedLangs routerDigest=$passedRouter lmDigest=$passedLm " +
                s"cutsDigest=$passedCuts — a drifted router re-partitions the " +
                "language streams and a drifted LM or cut re-partitions " +
                "pass/fail; rebuild instead")
            val frozenRouter = spark.read.parquet(routerDir)
            val frozenLm = spark.read.parquet(lmDir)
            val frozenCuts = spark.read.parquet(cutsDir)
            val docs = scope.pin(batch.select(col("doc_id"), col("text")))
            val routes = LangId
              .score(docs, col("doc_id"), col("text"), frozenRouter, ls, n, dim)
              .select(col("id").as("doc_id"), col("predicted_lang"))
            val routed = scope.pin(docs.join(routes, Seq("doc_id"), "left"))
            val scoreable = routed.filter(col("predicted_lang").isNotNull)
            // keyed scoring + the language's frozen cut; scoreBy's
            // uncovered keys and no-bigram docs surface as null scores,
            // split below by cut coverage
            val scored = scope.pin(scoreable
              .join(NgramLm.scoreBy(scoreable, col("doc_id"), col("text"),
                    col("predicted_lang"), frozenLm, scope)
                  .withColumnRenamed("k", "predicted_lang")
                  .withColumnRenamed("id", "doc_id")
                  // mean surprisal is back under per-bigram magnitude
                  // (the decimal is the SUM's overflow guard) — serve
                  // it as long, matching the cut table's type
                  .select(col("doc_id"), col("predicted_lang"),
                    col("avg_surprisal").cast("bigint").as("avg_surprisal")),
                Seq("doc_id", "predicted_lang"), "left")
              .join(broadcast(frozenCuts.withColumnRenamed("k", "predicted_lang")),
                Seq("predicted_lang"), "left"))
            ls.foreach { l =>
              scored.filter(col("predicted_lang") === l &&
                  col("avg_surprisal") <= col("max_avg_surprisal"))
                .select("doc_id", "text", "avg_surprisal")
                .write.mode("overwrite").parquet(s"$outDir/lang=$l/batch_$batchId")
            }
            // ONE rejects frame per batch, every reason labeled
            routed.filter(col("predicted_lang").isNull)
              .select(col("doc_id"), col("text"),
                col("predicted_lang"),
                lit(null).cast("bigint").as("avg_surprisal"),
                lit("null_text").as("reason"))
              .unionByName(scored.filter(col("max_avg_surprisal").isNull ||
                  col("avg_surprisal").isNull ||
                  col("avg_surprisal") > col("max_avg_surprisal"))
                .select(col("doc_id"), col("text"), col("predicted_lang"),
                  col("avg_surprisal"),
                  when(col("max_avg_surprisal").isNull, "uncovered_lang")
                    .when(col("avg_surprisal").isNull, "unscoreable")
                    .otherwise("lm_fail").as("reason")))
              .write.mode("overwrite").parquet(s"$rejectsDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
