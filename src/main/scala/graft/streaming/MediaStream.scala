package graft.streaming

import graft.operators.{CacheScope, Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming perceptual-hash MEDIA dedup at INGESTION — the streaming
  * member of the image-fingerprint family (q_media_dedup_px /
  * q_media_dedup_incr), run as a Structured Streaming job over the
  * bronze file queue (the [[SemanticStream]] discipline on the Hamming
  * metric):
  *
  * per micro-batch of `(media_id, media)` records — `media` is the
  * base64 payload of a REAL image container, decoded by the REAL
  * pipeline (`unbase64` → ImageIO → pooled gray grid → dHash):
  *  1. within-radius pairs TOUCHING the batch
  *     ([[Dedup.incrementalSimhashPairs]] — new×new blocked banded
  *     self-pairing plus new×STATE banded probe; old×old never
  *     re-pairs, per-batch cost flat in history) land in
  *     `pairsDir/batch_<id>`;
  *  2. the batch's `(id, simhash)` signatures append to the state as
  *     `stateDir/sigs/batch_<id>` — 64 bits per item, tiny next to
  *     the media bytes, exactly the persisted-fingerprint-store shape
  *     a production ingest keeps.
  *
  * Matching params are STATE properties (signatures banded under
  * different (sigLen, bands) never co-bucket; a different grid or
  * radius silently changes semantics), so the first batch freezes
  * `(maxDist, sigLen, bands, gw, gh)` into `stateDir/meta` and a
  * mismatched restart fails loudly. Compaction and crash contract are
  * [[AnnStream]]'s: `_FULL` fold every `compactEvery` generations,
  * dead deltas pruned by the next batch, state reads EXCLUDE the
  * replaying batch's own dir (a crash between state write and
  * checkpoint commit never feeds a batch its own signatures — which
  * would emit distance-0 self-pairs). */
object MediaStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      maxDist: Int,
      sigLen: Int = 64,
      bands: Int = 4,
      gw: Int = 9,
      gh: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 8): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    require(gh * (gw - 1) == sigLen,
      s"dHash over a ${gw}x$gh grid is ${gh * (gw - 1)} bits, declared sigLen=$sigLen")
    val sigsDir = s"$stateDir/sigs"
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
              Seq((maxDist, sigLen, bands, gw, gh))
                .toDF("max_dist", "sig_len", "bands", "gw", "gh")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == maxDist && meta.getInt(1) == sigLen &&
                meta.getInt(2) == bands && meta.getInt(3) == gw && meta.getInt(4) == gh,
              s"MediaStream: state built with maxDist=${meta.getInt(0)} " +
                s"sigLen=${meta.getInt(1)} bands=${meta.getInt(2)} grid=${meta.getInt(3)}x${meta.getInt(4)}, " +
                s"probed with maxDist=$maxDist sigLen=$sigLen bands=$bands grid=${gw}x$gh " +
                "— rebuild the index instead")
            // REAL decode: base64 → container bytes → ImageIO → grid →
            // dHash, batched per partition (the extractFeatures shape)
            val sigs = scope.pin(
              batch.select(col("media_id"), unbase64(col("media")).as("bytes"))
                .as(Encoders.product[(Long, Array[Byte])])
                .mapPartitions(_.map { case (id, bytes) =>
                  val img = Multimodal.PixelOps.decode(bytes).getOrElse(
                    throw new IllegalStateException(
                      s"MediaStream: payload of media_id=$id is not a decodable image"))
                  (id, Multimodal.dhashLocal(Multimodal.PixelOps.grayGrid(img, gw, gh), gw, gh))
                })(Encoders.product[(Long, String)])
                .toDF("id", "simhash"))
            val (live, dead) = FileQueue.liveGenerations(spark, sigsDir, batchId)
            FileQueue.deleteGenerations(spark, dead)
            val state =
              if (live.nonEmpty) spark.read.parquet(live: _*)
              else sigs.limit(0)
            Dedup.incrementalSimhashPairs(sigs, state, maxDist, sigLen, bands, scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            val out = s"$sigsDir/batch_$batchId"
            if (live.size + 1 >= compactEvery) {
              state.unionByName(sigs).write.mode("overwrite").parquet(out)
              FileQueue.markFull(spark, out)
            } else {
              sigs.write.mode("overwrite").parquet(out)
            }
          } finally scope.close()
        }
    }
  }
}
