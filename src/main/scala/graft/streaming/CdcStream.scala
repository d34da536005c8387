package graft.streaming

import graft.operators.SnapshotDiff
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous snapshot-diff (CDC by periodic full dumps) — the
  * [[SnapshotDiff]] operator run as a Structured Streaming job over
  * the file queue, for sources replicated by recurring full exports
  * (the common contract when a mutable store offers no changelog):
  *
  * per micro-batch (whose files together form ONE full snapshot):
  *   1. the snapshot reduces to `(keys..., digest)` — canonicalization
  *      runs once per generation;
  *   2. the change feed (added / removed / changed) comes from
  *      [[SnapshotDiff.diffDigests]] against the PERSISTED digest table
  *      of the previous generation — a join of 24-byte rows, never the
  *      snapshots themselves;
  *   3. the new digest table replaces the state for the next trigger.
  *
  * State is one digest row per live key — at 100 TB of snapshot the
  * state is GB-scale and the per-trigger cost is two digest-table
  * passes, independent of how many generations have streamed.
  *
  * Crash contract (the DedupStream discipline): every write lands in a
  * `batch_<id>` subdirectory with mode=overwrite, and the previous
  * generation is the HIGHEST `batch_<id>` below the current batch — a
  * replayed micro-batch that already wrote its own state diffs against
  * exactly what the original run saw, and rewrites exactly its own
  * output. One dump file per trigger is ENFORCED (maxFilesPerTrigger=1)
  * so two queued generations can never merge into one batch. State
  * generations below the prior are pruned after each commit — disk
  * holds at most two digest tables, however long the stream runs (the
  * `changes/batch_<id>` FEED is the consumer-owned output and is never
  * touched).
  *
  * Generation-integrity contract: ONE dump = ONE file. A dump exported
  * as several files would be split across triggers and each piece
  * diffed as a full snapshot, emitting bogus removed/added churn — so
  * the splits are DETECTED, not trusted to documentation: each file's
  * generation id (its parent-directory name for files dropped as
  * `srcDir/<export>/part-*`, else its filename with any `part-<n>`
  * segment stripped) is recorded in the state generation (`_GENERATION`
  * marker, invisible to the parquet reader), and a batch whose id
  * matches the prior generation's fails the stream loudly instead of
  * emitting a corrupt diff. Producers of multi-file exports must
  * coalesce to one file (or repack) before enqueueing; distinct dumps
  * must carry distinct names.
  *
  * Limitation (by contract, not accident): a ZERO-ROW dump is
  * indistinguishable from "no data arrived" inside foreachBatch, so
  * empty batches are skipped — truncating the source to nothing must
  * ship a tombstone generation (e.g. one sentinel row) rather than an
  * empty file, or the removals will be emitted only on the next
  * non-empty generation.
  */
object CdcStream {

  /** Generation-integrity check shared by every full-dump consumer
    * ([[CdcStream]], [[MatViewStream]]): resolve the batch's dump
    * generation from the checkpoint source log, and fail the stream
    * loudly if it matches the PRIOR state generation's marker — a dump
    * exported as multiple files would otherwise be consumed piecewise,
    * each piece diffed as a full snapshot. Returns the generation id
    * to record with this batch's state. Replays pass: the replayed
    * batch compares against the generation BELOW it, not itself. */
  private[streaming] def checkGeneration(
      spark: SparkSession, srcDir: String, checkpointDir: String,
      batchId: Long, priorStatePath: Option[String],
      consumer: String): String = {
    val gen = FileQueue.batchSourceFiles(spark, checkpointDir, batchId)
      .headOption.map(f => generationOf(srcDir, f)).getOrElse("")
    for {
      priorPath <- priorStatePath if gen.nonEmpty
      priorGen <- readMarker(spark, priorPath) if priorGen == gen
    } throw new IllegalStateException(
      s"$consumer: batch $batchId file belongs to generation '$gen', same as the " +
        "previous snapshot — the dump was exported as multiple files and would be " +
        "consumed piecewise, corrupting the output. Coalesce each " +
        "export to ONE uniquely-named file before enqueueing.")
    gen
  }

  /** Generation id of a queued dump file: the parent-directory name when
    * the file sits below a subdirectory of `srcDir` (directory-per-export
    * producers — Spark itself writes `out/part-00000-…`), else the bare
    * filename with any `part-<n>` segment removed (so `dump7-part-001
    * .json` and `dump7-part-002.json` collide to `dump7.json` and the
    * split is caught). Well-behaved producers — one uniquely-named file
    * per dump — map 1:1. */
  private[streaming] def generationOf(srcDir: String, file: String): String = {
    val p = new org.apache.hadoop.fs.Path(file)
    val parentName = Option(p.getParent).map(_.getName).getOrElse("")
    val srcName = new org.apache.hadoop.fs.Path(srcDir).getName
    if (parentName.nonEmpty && parentName != srcName) parentName
    else p.getName.replaceAll("(?i)[-_.]?part[-_]?\\d+", "")
  }

  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      changesDir: String,
      checkpointDir: String,
      keys: Seq[String],
      digestOf: DataFrame => Column,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(!keys.contains("digest"),
      "CdcStream: 'digest' is reserved for the state-table digest column")
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger,
      maxFilesPerTrigger = 1) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // batch-scoped pins — a long-running stream must not
          // accumulate one cache entry per micro-batch
          val scope = new graft.operators.CacheScope
          try {
            // read twice (diff + state write) — pin per batch
            val newDig = scope.pin(batch
              .select(keys.map(col) :+ digestOf(batch).as("digest"): _*))
            val prior: Option[(Long, String)] = FileQueue.batchDirs(spark, stateDir)
              .filter(_._1 < batchId).sortBy(_._1).lastOption
            val gen = checkGeneration(spark, srcDir, checkpointDir, batchId,
              prior.map(_._2), "CdcStream")
            val changes = prior match {
              case Some((_, p)) =>
                SnapshotDiff.diffDigests(spark.read.parquet(p), newDig, keys)
              case None => // first generation: everything is an add
                newDig.select(keys.map(col) :+ lit("added").as("change_type"): _*)
            }
            changes.write.mode("overwrite").parquet(s"$changesDir/batch_$batchId")
            newDig.write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
            writeMarker(spark, s"$stateDir/batch_$batchId", gen)
            // retention: once this generation's state is committed, only
            // the prior can ever be read again (and only by a replay of
            // THIS batch) — everything below it is dead weight
            prior.foreach { case (id, _) =>
              FileQueue.pruneBatchDirsBelow(spark, stateDir, keepFrom = id) }
          } finally scope.close()
        }
    }
  }

  /** `_GENERATION` marker inside a state generation dir — underscore
    * prefix keeps it invisible to the parquet reader. Written AFTER the
    * parquet commit (overwrite wipes the dir first); a missing marker
    * (pre-upgrade state) just skips the integrity check once. */
  private def markerPath(dir: String) = new org.apache.hadoop.fs.Path(dir, "_GENERATION")

  private[streaming] def readMarker(spark: SparkSession, dir: String): Option[String] = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  private[streaming] def writeMarker(spark: SparkSession, dir: String, gen: String): Unit = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
