package graft.streaming

import graft.operators.{CacheScope, Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming perceptual-hash MEDIA dedup at INGESTION — the streaming
  * member of the media-fingerprint family (q_media_dedup_px /
  * q_media_dedup_incr / q_audio_dedup), run as a Structured Streaming
  * job over the bronze file queue (the [[SemanticStream]] discipline
  * on the Hamming metric):
  *
  * per micro-batch of `(media_id, media)` records — `media` is the
  * base64 payload of a REAL container, decoded by the REAL pipeline
  * (an [[MediaStream.Extractor]]: ImageIO → pooled gray grid → dHash
  * for images, WAV → PCM envelope → WHT signs for audio):
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

  /** Pluggable payload→fingerprint extractor: which REAL decode chain
    * turns container bytes into the banded bit-string signature. The
    * extractor identity is part of the frozen state stamp — signatures
    * from different extractors (or different grids/bin counts) are
    * incomparable, so a drifted restart must fail loudly. An
    * UNDECODABLE payload returns None and is ROUTED, not thrown
    * (ADVICE r13: crash replay re-reads the same source files, so a
    * thrown corrupt record is a poison pill that permanently wedges
    * the stream — the LmFilterStream null-score discipline instead). */
  sealed trait Extractor extends Serializable {
    def tag: String
    def sigLen: Int
    def bands: Int
    def signature(id: Long, bytes: Array[Byte]): Option[String]
  }

  /** Image tier: ImageIO decode → `gw`×`gh` pooled gray grid → dHash. */
  final case class ImageDhash(gw: Int = 9, gh: Int = 8, bandCount: Int = 4) extends Extractor {
    def tag: String = s"image_dhash_${gw}x$gh"
    def sigLen: Int = gh * (gw - 1)
    def bands: Int = bandCount
    def signature(id: Long, bytes: Array[Byte]): Option[String] =
      Multimodal.PixelOps.decode(bytes).map(img =>
        Multimodal.dhashLocal(Multimodal.PixelOps.grayGrid(img, gw, gh), gw, gh))
  }

  /** Audio tier: WAV parse → 16-bit PCM → 64-bin energy envelope →
    * WHT sign bits (volume-invariant — the q_audio_dedup chain). */
  final case class AudioWhtEnvelope(bandCount: Int = 3) extends Extractor {
    def tag: String = "audio_wht_env64"
    def sigLen: Int = 63
    def bands: Int = bandCount
    def signature(id: Long, bytes: Array[Byte]): Option[String] =
      Multimodal.AudioOps.pcm16Samples(bytes).map(pcm =>
        Multimodal.phashLocal(Multimodal.AudioOps.envelope(pcm, 64)))
  }

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      maxDist: Int,
      extractor: Extractor = ImageDhash(),
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 8,
      rejectsDir: String = ""): StreamingQuery = {
    require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")
    val sigLen = extractor.sigLen
    val bands = extractor.bands
    val sigsDir = s"$stateDir/sigs"
    val metaDir = s"$stateDir/meta"
    // undecodable payloads route here (default: next to the state) —
    // a reject is DATA (inspect/re-ingest), never a stream failure
    val rejects = if (rejectsDir.nonEmpty) rejectsDir else s"$stateDir/rejects"
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val scope = new CacheScope
          try {
            val fs = new org.apache.hadoop.fs.Path(metaDir)
              .getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
              import spark.implicits._
              Seq((maxDist, sigLen, bands, extractor.tag))
                .toDF("max_dist", "sig_len", "bands", "extractor")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == maxDist && meta.getInt(1) == sigLen &&
                meta.getInt(2) == bands && meta.getString(3) == extractor.tag,
              s"MediaStream: state built with maxDist=${meta.getInt(0)} " +
                s"sigLen=${meta.getInt(1)} bands=${meta.getInt(2)} extractor=${meta.getString(3)}, " +
                s"probed with maxDist=$maxDist sigLen=$sigLen bands=$bands " +
                s"extractor=${extractor.tag} — rebuild the index instead")
            // REAL decode: base64 → container bytes → the extractor's
            // chain, batched per partition (the extractFeatures shape).
            // Undecodable payloads surface as null signatures and are
            // ROUTED to the reject sink — one corrupt record must not
            // fail the micro-batch (crash replay would re-read it
            // forever: the poison-pill path ADVICE r13 flagged).
            val decoded = scope.pin(
              batch.select(col("media_id"), unbase64(col("media")).as("bytes"))
                .as(Encoders.product[(Long, Array[Byte])])
                .mapPartitions(_.map { case (id, bytes) =>
                  (id, extractor.signature(id, bytes).orNull)
                })(Encoders.product[(Long, String)])
                .toDF("id", "simhash"))
            decoded.filter(col("simhash").isNull)
              .select(col("id").as("media_id"), lit(extractor.tag).as("extractor"))
              .write.mode("overwrite").parquet(s"$rejects/batch_$batchId")
            val sigs = decoded.filter(col("simhash").isNotNull)
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
