package graft.streaming

import graft.operators.CacheScope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming DOMAIN-QUOTA admission at INGESTION — the streaming
  * member of the domain-curation family (q_domain_cap's RefinedWeb
  * shape, enforced where a production pipeline actually enforces it:
  * as documents arrive, not after the corpus lands): per micro-batch
  * of `(doc_id, source, …)` records,
  *
  *  1. blocklisted domains route straight to `overflowDir` (reason
  *     `blocked`), and NULL-source records — which have no quota
  *     identity — route there too (reason `null_source`), so every
  *     input row lands in exactly one sink;
  *  2. each surviving domain's REMAINING quota is `cap` minus the
  *     PERSISTED admitted count; the batch's documents rank within
  *     their domain in md5-of-id order (the repo's deterministic draw
  *     — replays and reshuffles admit the same set) and the first
  *     `remaining` are admitted to `admitDir`, the rest overflow with
  *     reason `quota`;
  *  3. the batch's per-domain admitted counts append to the state as
  *     `stateDir/counts/batch_<id>` — a few rows per domain, the
  *     persisted-quota-ledger shape.
  *
  * The per-domain rank runs as a window ONLY over the micro-batch —
  * batch-bounded by construction (an ingestion trigger fits one
  * task's sort); the CORPUS never windows, and the state the batch
  * joins against is domain-cardinality-sized (broadcast). `cap` and
  * the blocklist freeze into `stateDir/meta` on the first batch — a
  * drifted restart silently changes which documents a replay admits,
  * so it fails loudly instead. Compaction and crash contract are
  * [[MediaStream]]'s: `_FULL` fold every `compactEvery` generations,
  * state reads EXCLUDE the replaying batch's own generation (a crash
  * between state write and checkpoint commit never double-counts a
  * batch's own admissions). */
object DomainCapStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      admitDir: String,
      overflowDir: String,
      checkpointDir: String,
      cap: Long,
      blocklist: Seq[String] = Seq.empty,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 8): StreamingQuery = {
    require(cap >= 1, s"DomainCapStream: cap must be >= 1, got $cap")
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val countsDir = s"$stateDir/counts"
    val metaDir = s"$stateDir/meta"
    val blockStamp = blocklist.sorted.mkString(",")
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              Seq((cap, blockStamp)).toDF("cap", "blocklist")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getLong(0) == cap && meta.getString(1) == blockStamp,
              s"DomainCapStream: quotas frozen with cap=${meta.getLong(0)} " +
                s"blocklist=[${meta.getString(1)}], probed with cap=$cap " +
                s"blocklist=[$blockStamp] — a drifted quota admits a different " +
                "set under replay; rebuild the ledger instead")
            // split off blocked domains first — they never touch quota.
            // NULL-source rows satisfy neither isin(...) nor !isin(...)
            // (both predicates evaluate to NULL) and have no quota
            // identity at all, so they route to overflow with their own
            // reason — the ClassifierFilterStream unscoreable
            // discipline; without the coalesce they would land in
            // NEITHER sink and silently vanish (ADVICE r14).
            val rows = scope.pin(batch)
            val isNullSrc = col("source").isNull
            val isBlocked =
              if (blocklist.isEmpty) lit(false)
              else coalesce(col("source").isin(blocklist: _*), lit(false))
            val unrouted = rows.filter(isNullSrc)
            val blocked = rows.filter(isBlocked && !isNullSrc)
            val eligible = rows.filter(!isBlocked && !isNullSrc)
            // persisted per-domain admitted counts (crash guard:
            // exclude this batch's own generation)
            val (live, dead) = FileQueue.liveGenerations(spark, countsDir, batchId)
            FileQueue.deleteGenerations(spark, dead)
            val state =
              if (live.nonEmpty)
                spark.read.parquet(live: _*)
                  .groupBy("source").agg(sum("n_admitted").as("__used"))
              else eligible.select(col("source"), lit(0L).as("__used")).limit(0)
            // rank within the batch per domain (batch-bounded window),
            // admit up to the remaining quota
            import org.apache.spark.sql.expressions.Window
            val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
              16, 10).cast("long")
            val ranked = scope.pin(eligible
              .withColumn("__rk", row_number().over(
                Window.partitionBy("source").orderBy(h, col("doc_id"))))
              .join(broadcast(state), Seq("source"), "left")
              .withColumn("__rem", lit(cap) - coalesce(col("__used"), lit(0L))))
            val admitted = ranked.filter(col("__rk") <= col("__rem"))
            admitted.drop("__rk", "__used", "__rem")
              .write.mode("overwrite").parquet(s"$admitDir/batch_$batchId")
            ranked.filter(col("__rk") > col("__rem"))
              .drop("__rk", "__used", "__rem")
              .withColumn("reason", lit("quota"))
              .unionByName(blocked.withColumn("reason", lit("blocked")))
              .unionByName(unrouted.withColumn("reason", lit("null_source")))
              .write.mode("overwrite").parquet(s"$overflowDir/batch_$batchId")
            // append this batch's admissions to the ledger (+ compact)
            val delta = admitted.groupBy("source").agg(count(lit(1)).as("n_admitted"))
            val out = s"$countsDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              spark.read.parquet(live: _*).unionByName(delta)
                .groupBy("source").agg(sum("n_admitted").as("n_admitted"))
                .write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              delta.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
