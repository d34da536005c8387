package graft.streaming

import graft.operators.{CacheScope, PrefixSum, ShardManifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming SEQUENCE PACKER — [[PrefixSum.packByBudget]]'s
  * concat-then-slice scheme run per arriving micro-batch with a
  * persisted RUNNING-OFFSET ledger, so the shard stream a training
  * loader consumes is continuous across batches (document k of batch
  * n starts exactly where batch n-1's stream ended — the loader sees
  * ONE corpus, not per-batch fragments), completing the packing
  * family's streaming matrix next to the batch member
  * (q_pack_sequences) and the manifest interchange (q_shard_manifest).
  * Per micro-batch of `(doc_id, n_units)` records:
  *
  *  - rows with NULL units route to `rejectsDir/batch_<id>` with
  *    reason `null_units` — a packer cannot place a sizeless document
  *    (the every-input-routes-somewhere invariant);
  *  - the rest pack in doc_id order: within-batch distributed prefix
  *    sum ([[PrefixSum.withRunningTotal]] — never a 1-partition
  *    window) + the persisted base offset → `(doc_id, n_units,
  *    offset_end, bin)` into `shardsDir/batch_<id>`;
  *  - the batch's MANIFEST DELTA ([[ShardManifest.build]] over the
  *    batch's packed rows) lands in `manifestDir/batch_<id>`. The
  *    manifest digest is an order-free XOR and the counts are sums,
  *    so deltas FOLD: [[mergedManifest]] recovers the exact manifest
  *    of the whole stream-so-far shard-wise — a bin straddling two
  *    batches merges into one correct row (the interchange contract
  *    holds without ever re-reading old shards).
  *
  * State is the OFFSET LEDGER: per-generation unit deltas under
  * `stateDir/offset/batch_<id>` (sums are additive, so the base is
  * one tiny aggregate over live generations; compaction folds them —
  * the [[DomainCapStream]] quota-ledger shape), with the
  * own-generation crash-replay guard: a replaying batch reads only
  * OTHER generations' deltas and overwrites its own outputs, so
  * replay never double-advances the offset. The `budget` freezes into
  * `stateDir/meta` on the first batch — a restart with a different
  * cut fails loudly instead of silently re-slicing the stream
  * mid-corpus.
  *
  * Scale shape per batch: one range-sort prefix sum + one map-side-
  * combining manifest aggregate over the batch; the ledger read is
  * generations-sized (bounded by `compactEvery`), never corpus-sized. */
object PackStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      shardsDir: String,
      manifestDir: String,
      rejectsDir: String,
      checkpointDir: String,
      budget: Long,
      compactEvery: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(budget > 0, s"PackStream: budget must be positive, got $budget")
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val offsetDir = s"$stateDir/offset"
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
              Seq(budget).toDF("budget").write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getLong(0) == budget,
              s"PackStream: stream frozen with budget=${meta.getLong(0)}, " +
                s"probed with budget=$budget — a drifted budget re-slices " +
                "the shard stream inconsistently; rebuild the packing instead")
            val rows = scope.pin(batch.select(col("doc_id"), col("n_units")))
            val rejects = rows.filter(col("n_units").isNull)
            val eligible = rows.filter(col("n_units").isNotNull)
            // persisted base offset (crash guard: own generation excluded)
            val (live, dead) = FileQueue.liveGenerations(spark, offsetDir, batchId)
            FileQueue.deleteGenerations(spark, dead)
            val base: Long =
              if (live.isEmpty) 0L
              else spark.read.parquet(live: _*).agg(sum("units")).head() match {
                case r if r.isNullAt(0) => 0L
                case r => r.getLong(0)
              }
            val packed = scope.pin(
              PrefixSum.withRunningTotal(eligible, Seq(col("doc_id")),
                  col("n_units"), "__run", tieBreaker = Some(col("doc_id")))
                .withColumn("offset_end", col("__run") + lit(base))
                .withColumn("bin",
                  floor((col("offset_end") - col("n_units")) / budget).cast("long"))
                .select(col("doc_id"), col("n_units"), col("offset_end"), col("bin")))
            packed.write.mode("overwrite").parquet(s"$shardsDir/batch_$batchId")
            val compacting = live.size + 1 >= compactEvery
            // manifest delta — or, on a compaction batch, the RE-MANIFEST:
            // every live delta folds with this batch's into ONE full
            // manifest (marked _FULL), so a loader reads one manifest +
            // the tail deltas instead of the whole batch history; dead
            // generations below the previous full marker are pruned here
            val delta = ShardManifest.build(
              packed, col("bin"), col("doc_id"), col("n_units"), budget)
            val (mLive, mDead) = FileQueue.liveGenerations(spark, manifestDir, batchId)
            FileQueue.deleteGenerations(spark, mDead)
            val manifestOut =
              if (compacting && mLive.nonEmpty)
                foldManifest(spark.read.parquet(mLive: _*).unionByName(delta), manifestDir)
              else delta
            manifestOut.write.mode("overwrite").parquet(s"$manifestDir/batch_$batchId")
            if (compacting) FileQueue.markFull(spark, s"$manifestDir/batch_$batchId")
            rejects.withColumn("reason", lit("null_units"))
              .write.mode("overwrite").parquet(s"$rejectsDir/batch_$batchId")
            // advance the ledger by this batch's units (+ compact)
            import spark.implicits._
            // an all-rejects batch leaves `packed` empty → null sum; the
            // ledger must still advance by 0 or the batch replays forever
            val batchUnits = packed.agg(sum("n_units")).head() match {
              case r if r.isNullAt(0) => 0L
              case r => r.getLong(0)
            }
            val out = s"$offsetDir/batch_$batchId"
            if (compacting) {
              Seq(base + batchUnits).toDF("units")
                .write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              Seq(batchUnits).toDF("units").write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }

  /** Fold every LIVE manifest generation (the newest `_FULL`
    * re-manifest plus later deltas — on an uncompacted stream, all
    * deltas) into the manifest of the whole stream-so-far:
    * counts/units ADD, digests XOR — shard-wise exact, the loader-side
    * companion of [[ShardManifest.verify]]. Fails loudly on mixed
    * stamps (a foreign delta folded in would silently corrupt every
    * straddled shard). */
  def mergedManifest(spark: SparkSession, manifestDir: String): DataFrame = {
    val (live, _) = FileQueue.liveGenerations(spark, manifestDir, excludeId = -1L)
    require(live.nonEmpty, s"PackStream: no manifest deltas under $manifestDir")
    foldManifest(spark.read.parquet(live: _*), manifestDir)
  }

  /** The shard-wise fold shared by [[mergedManifest]] and the
    * compaction-batch re-manifest. */
  private def foldManifest(all: DataFrame, dir: String): DataFrame = {
    val stamp = all.select("format", "version", "budget").distinct().collect()
    require(stamp.length == 1,
      s"PackStream: manifest deltas under $dir carry ${stamp.length} " +
        "distinct stamps — refusing to fold mixed artifacts")
    all.groupBy("shard")
      .agg(sum("n_rows").as("n_rows"), sum("n_units").as("n_units"),
        expr("bit_xor(digest)").as("digest"))
      .select(lit(stamp.head.getString(0)).as("format"),
        lit(stamp.head.getInt(1)).as("version"),
        lit(stamp.head.getLong(2)).as("budget"),
        col("shard"), col("n_rows"), col("n_units"), col("digest"))
  }
}
