package graft.streaming

import graft.operators.{MatView, SnapshotDiff}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuously-maintained materialized aggregate — [[MatView]] run as
  * a Structured Streaming job over the same full-dump file queue
  * [[CdcStream]] consumes: every arriving snapshot generation rolls
  * the persisted view forward by delta arithmetic, never by
  * re-aggregating a corpus.
  *
  * The state table extends CdcStream's digest state with the VIEW'S
  * INPUT PROJECTION: one row per live key carrying `(keys..., digest,
  * group exprs..., sum inputs...)`. That is what makes retraction
  * possible without any base access — when a key changes or
  * disappears, its old contribution is read from the state row, not
  * from the (archived, gone) previous snapshot. The widening is the
  * whole trade: state rows grow from 24 bytes to 24 + the view's
  * input width, still one narrow row per live key, GB-scale against a
  * 100 TB corpus.
  *
  * Per micro-batch (one full snapshot dump, `maxFilesPerTrigger=1`):
  *   1. the snapshot reduces once to the state projection;
  *   2. the change feed comes from [[SnapshotDiff.diffDigests]] against
  *      the persisted previous generation;
  *   3. minus-rows = prior state semi-joined to changed/removed keys,
  *      plus-rows = new state semi-joined to added/changed keys, and
  *      the view merges via [[MatView.refreshFromRows]] — cost is
  *      O(changed keys) + a view-sized merge;
  *   4. state and view replace themselves for the next trigger.
  *
  * Crash contract: the DedupStream/CdcStream discipline verbatim —
  * every write lands in a `batch_<id>` overwrite dir, the previous
  * generation is the highest id below the current batch, and
  * retention prunes below the prior after each commit. A replayed
  * micro-batch diffs against exactly what the original run saw and
  * rewrites exactly its own output.
  *
  * Generation integrity: [[CdcStream.checkGeneration]] — a dump
  * exported as multiple files would be consumed piecewise and each
  * piece's "removals" would wrongly retract live keys from the view,
  * so the split fails the stream loudly, exactly like CdcStream.
  * Same empty-dump limitation too: a zero-row dump is skipped; ship a
  * tombstone generation to truncate.
  */
object MatViewStream {

  /** Latest committed view generation under `viewDir` (for consumers
    * and tests). */
  def currentView(spark: SparkSession, viewDir: String): Option[DataFrame] =
    FileQueue.batchDirs(spark, viewDir).sortBy(_._1).lastOption
      .map { case (_, p) => spark.read.parquet(p) }

  /** @param groups  view group keys: alias -> expression over the dump
    * @param sums    maintained sums: alias -> expression over the dump
    *                (cast DECIMAL here — the [[MatView]] exactness rule)
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      viewDir: String,
      checkpointDir: String,
      keys: Seq[String],
      digestOf: DataFrame => Column,
      groups: Seq[(String, Column)],
      sums: Seq[(String, Column)],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val reserved = Seq("digest", "change_type", "cnt", "__w")
    val aliases = keys ++ groups.map(_._1) ++ sums.map(_._1)
    require(aliases.distinct.size == aliases.size,
      s"MatViewStream: duplicate column aliases: $aliases")
    reserved.foreach(r => require(!aliases.contains(r),
      s"MatViewStream: '$r' is reserved"))
    val groupKeys = groups.map(_._1)
    // over the STATE table the inputs are already projected — the view
    // merge addresses them by alias
    val stateSums = sums.map { case (a, _) => a -> col(a) }
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger,
      maxFilesPerTrigger = 1) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // batch-scoped pin — a long-running stream must not
          // accumulate one cache entry per micro-batch
          val scope = new graft.operators.CacheScope
          try {
          val newState = scope.pin(batch.select(
            keys.map(col) ++ Seq(digestOf(batch).as("digest")) ++
              (groups ++ sums).map { case (a, c) => c.as(a) }: _*))
          val prior: Option[(Long, String)] = FileQueue.batchDirs(spark, stateDir)
            .filter(_._1 < batchId).sortBy(_._1).lastOption
          // a multi-file dump split across triggers would double-count
          // its pieces into the view — same loud failure as CdcStream
          val gen = CdcStream.checkGeneration(spark, srcDir, checkpointDir,
            batchId, prior.map(_._2), "MatViewStream")
          val priorState = prior.map { case (_, p) => spark.read.parquet(p) }
          val feed = priorState match {
            case Some(st) => SnapshotDiff.diffDigests(
              st.select(keys.map(col) :+ col("digest"): _*), newState, keys)
            case None => newState
              .select(keys.map(col) :+ lit("added").as("change_type"): _*)
          }
          val view = FileQueue.batchDirs(spark, viewDir)
            .filter(_._1 < batchId).sortBy(_._1).lastOption
            .map { case (_, p) => spark.read.parquet(p) }
            .getOrElse(MatView.build(newState.limit(0), groupKeys, stateSums))
          val retract = broadcast(
            feed.filter(col("change_type").isin("removed", "changed"))
              .select(keys.map(col): _*))
          val advance = broadcast(
            feed.filter(col("change_type").isin("added", "changed"))
              .select(keys.map(col): _*))
          val refreshed = MatView.refreshFromRows(view,
            priorState.map(_.join(retract, keys, "left_semi"))
              .getOrElse(newState.limit(0)),
            newState.join(advance, keys, "left_semi"),
            groupKeys, stateSums)
          refreshed.write.mode("overwrite").parquet(s"$viewDir/batch_$batchId")
          newState.write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
          CdcStream.writeMarker(spark, s"$stateDir/batch_$batchId", gen)
          prior.foreach { case (id, _) =>
            FileQueue.pruneBatchDirsBelow(spark, stateDir, keepFrom = id)
            FileQueue.pruneBatchDirsBelow(spark, viewDir, keepFrom = id)
          }
          } finally scope.close()
        }
    }
  }
}
