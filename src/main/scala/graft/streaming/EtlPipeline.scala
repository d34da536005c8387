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

  def start(
      spark: SparkSession,
      bronzeDir: String,
      archiveDir: String,
      silverDir: String,
      goldDir: String,
      checkpointDir: String,
      scorer: Scorer,
      cfg: EnrichConfig = EnrichConfig(),
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    FileQueue.start(spark, bronzeDir, Bronze.productSchema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // operator-internal caches created by THIS batch are released
          // at the end of it; a snapshot keeps caller-owned caches alive
          // (clearCache() here would evict the whole session's pins)
          val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
          // P2: dense ids over the batch's natural unique order
          val items = DenseId.withDenseId(
            batch.withColumn("signal", productSignal),
            Seq(col("id"), col("shop_id"), col("product_name"), col("date")),
            "item_id")
          // §2.9 + J1
          val analysis = Enrich.enrich(items.select("item_id", "signal"), scorer, cfg)
          val enriched = Enrich.merge(items.drop("signal"), analysis)
          // K4 silver (50k-row chunks in production; here per micro-batch)
          Sinks.chunkedWrite(enriched, s"$silverDir/batch_$batchId")
          // K2 gold: upsert this batch's user KPIs into the keyed table
          val kpis = Kpis.userKpis(enriched)
          val goldPath = new org.apache.hadoop.fs.Path(s"$goldDir/user_kpis")
          val bak = new org.apache.hadoop.fs.Path(s"$goldPath.bak")
          val fs = goldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // crash recovery: a previous batch may have died between
          // "gold renamed aside" and "tmp renamed in" — the backup IS
          // the table then; restore it before reading.
          if (!fs.exists(goldPath) && fs.exists(bak)) fs.rename(bak, goldPath)
          // existence via the Hadoop FS (java.io would always say "no"
          // on hdfs/s3a and silently drop the upsert contract)
          val merged =
            if (fs.exists(goldPath))
              Sinks.upsertByKey(spark.read.parquet(goldPath.toString), kpis, Seq("id"))
            else kpis
          // write via temp + move: the upsert reads the table it replaces
          val tmp = new org.apache.hadoop.fs.Path(s"$goldPath.tmp_$batchId")
          merged.write.mode("overwrite").parquet(tmp.toString)
          // crash-safe swap: the old table is renamed ASIDE (never
          // deleted before the new one is in place), so at every instant
          // gold or gold.bak holds one complete copy of the accumulated
          // KPIs; the recovery rename above heals any crash window.
          if (fs.exists(bak)) fs.delete(bak, true)
          if (fs.exists(goldPath)) fs.rename(goldPath, bak)
          fs.rename(tmp, goldPath)
          fs.delete(bak, true)
          // free only the caches THIS batch created (KPI scoring pins
          // one per call) — a long-running stream must not accumulate
          // one per batch, and must not evict the caller's either
          val persisted = spark.sparkContext.getPersistentRDDs
          persisted.keys.filterNot(cachedBefore)
            .foreach(id => persisted(id).unpersist(blocking = false))
        }
    }
}
