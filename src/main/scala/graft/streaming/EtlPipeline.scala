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
          val fs = goldPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // existence via the Hadoop FS (java.io would always say "no"
          // on hdfs/s3a and silently drop the upsert contract)
          val merged =
            if (fs.exists(goldPath))
              Sinks.upsertByKey(spark.read.parquet(goldPath.toString), kpis, Seq("id"))
            else kpis
          // write via temp + move: the upsert reads the table it replaces
          val tmp = new org.apache.hadoop.fs.Path(s"$goldPath.tmp_$batchId")
          merged.write.mode("overwrite").parquet(tmp.toString)
          fs.delete(goldPath, true)
          fs.rename(tmp, goldPath)
          // free this batch's operator caches (KPI scoring pins one) —
          // a long-running stream must not accumulate one per batch
          spark.catalog.clearCache()
        }
    }
}
