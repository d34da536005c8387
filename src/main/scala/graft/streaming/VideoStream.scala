package graft.streaming

import graft.operators.{CacheScope, Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming VIDEO near-dup detection at INGESTION — the streaming
  * member of the frame-shingle family (q_video_dedup /
  * q_video_dedup_incr): the [[DedupStream]] minhash-state discipline,
  * with the document text replaced by the REAL per-frame decode chain
  * (base64 → MJPEG-AVI parse → per-frame ImageIO decode → pooled-grid
  * dHash), frame-hash SHINGLES as the set representation, and the
  * frame-hash store as the corpus the verification re-reads:
  *
  * per micro-batch of `(media_id, media)` records:
  *   1. frame hashes land in `framesDir/batch_<id>` — the silver
  *     artifact (one row per frame, tiny next to the video bytes);
  *   2. adjacent-frame shingles → MinHash bands (corpus-independent,
  *     batch-local work);
  *   3. candidates = batch×batch plus batch×STATE band probes
  *     ([[Dedup.incrementalCandidates]] — old×old never pairs);
  *   4. exact shingle-Jaccard verification reads ONLY candidate
  *     videos' frame hashes from the store (broadcast semi-join);
  *   5. verified pairs and the batch's bands append to their tables.
  *
  * Matching params `(k, bandWidth, shingle order, grid, threshold)`
  * freeze into `stateDir/meta` on the first batch; a drifted restart
  * fails loudly (bands from different parameters never co-bucket —
  * the [[MediaStream]] stamp discipline). Crash contract: every write
  * is a `batch_<id>` overwrite, and state reads exclude the replaying
  * batch's own generation. */
object VideoStream {

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      framesDir: String,
      stateDir: String,
      pairsDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      k: Int = 8,
      bandWidth: Int = 2,
      threshold: Double = 0.5,
      gw: Int = 9,
      gh: Int = 8,
      rejectsDir: String = ""): StreamingQuery = {
    val bandsDir = s"$stateDir/bands"
    val metaDir = s"$stateDir/meta"
    // unparsable containers route here (default: next to the state) —
    // a reject is DATA, never a stream failure (the MediaStream
    // poison-pill discipline; ADVICE r13)
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
              Seq((k, bandWidth, threshold, gw, gh))
                .toDF("k", "band_width", "threshold", "gw", "gh")
                .write.mode("overwrite").parquet(metaDir)
            }
            val meta = spark.read.parquet(metaDir).head()
            require(meta.getInt(0) == k && meta.getInt(1) == bandWidth &&
                meta.getDouble(2) == threshold && meta.getInt(3) == gw && meta.getInt(4) == gh,
              s"VideoStream: state built with k=${meta.getInt(0)} " +
                s"bandWidth=${meta.getInt(1)} threshold=${meta.getDouble(2)} " +
                s"grid=${meta.getInt(3)}x${meta.getInt(4)}, probed with k=$k " +
                s"bandWidth=$bandWidth threshold=$threshold grid=${gw}x$gh " +
                "— rebuild the index instead")
            // REAL decode: every movi frame through ImageIO, hashed.
            // An unparsable container yields ONE sentinel row
            // (frame_idx = -1) instead of a throw — routed to the
            // reject sink below, so a corrupt record cannot wedge the
            // stream under crash replay (the MediaStream discipline).
            // A container that PARSES but yields zero frames gets the
            // same sentinel: it produces no shingles, no bands, and no
            // store rows, so without the sentinel it would reach
            // neither framesDir nor rejects and silently vanish — the
            // every-input-routes-somewhere invariant (ADVICE r14).
            // Pinned: the decode pass feeds the frames write AND the
            // shingle build — without the pin every consumer re-decodes
            // the batch's payloads.
            val decoded = scope.pin(
              batch.select(col("media_id"), unbase64(col("media")).as("bytes"))
                .as(Encoders.product[(Long, Array[Byte])])
                .mapPartitions(_.flatMap { case (id, bytes) =>
                  Multimodal.videoFrameHashes(bytes, gw, gh) match {
                    case Some(hs) if hs.nonEmpty =>
                      hs.zipWithIndex.map { case (h, i) => (id, i, h) }
                    case _ => Seq((id, -1, ""))
                  }
                })(Encoders.product[(Long, Int, String)])
                .toDF("media_id", "frame_idx", "fhash"))
            decoded.filter(col("frame_idx") < 0).select(col("media_id"))
              .write.mode("overwrite").parquet(s"$rejects/batch_$batchId")
            val fh = decoded.filter(col("frame_idx") >= 0)
            fh.write.mode("overwrite").parquet(s"$framesDir/batch_$batchId")
            def shinglesOf(frames: DataFrame): DataFrame = {
              import org.apache.spark.sql.expressions.Window
              frames.withColumn("__next", lead("fhash", 1).over(
                  Window.partitionBy("media_id").orderBy("frame_idx")))
                .filter(col("__next").isNotNull)
                .select(col("media_id").as("id"),
                  concat(col("fhash"), lit(" "), col("__next")).as("shingle"))
                .distinct()
            }
            // bands feed the self-pair gate, the probe, and the state
            // write — pin per batch
            val bands = scope.pin(Dedup.lshBands(
              Dedup.minhashSignature(shinglesOf(fh), k), k, bandWidth))
            // crash-replay guard: exclude this batch's own generation
            val priorState: Seq[String] = FileQueue.batchDirs(spark, bandsDir)
              .filter(_._1 != batchId).map(_._2)
            val cands =
              if (priorState.nonEmpty)
                Dedup.incrementalCandidates(bands, spark.read.parquet(priorState: _*))
              else Dedup.candidatePairs(bands)
            // verification frame hashes come from the store (batch
            // included — written first), confined to candidate ids
            val candIds = cands.select(col("id_a").as("media_id"))
              .union(cands.select(col("id_b").as("media_id"))).distinct()
            val candFrames = spark.read.parquet(s"$framesDir/*")
              .join(broadcast(candIds), Seq("media_id"), "left_semi")
            Dedup.jaccardVerify(cands, shinglesOf(candFrames), threshold, scope)
              .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")
            bands.write.mode("overwrite").parquet(s"$bandsDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
