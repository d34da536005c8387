package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming SEMANTIC eval-decontamination at INGESTION — the
  * streaming member of the q_decontaminate_embed screen (the one gap
  * SURVEY §17 declared open): every arriving `(vec_id, embedding)`
  * record is scored map-side against the FROZEN eval reference set
  * ([[Similarity.maxCosExpr]] — exact max cosine, zero joins, the
  * batch never shuffles) and split:
  *
  *  - survivors (`max_cos < threshold`) land in `passDir/batch_<id>`
  *    with their eval proximity (observability, same as the batch
  *    screen's `eval_cos` column);
  *  - contaminated rows land in `dropDir/batch_<id>` with the cosine
  *    that condemned them (audit trail — a decontamination screen
  *    that silently discards is undebuggable).
  *
  * Unlike [[SemanticStream]]/[[AnnStream]] there is NO growing state:
  * the screen is stateless per record, so per-batch cost is exactly
  * one narrow map over the batch regardless of history — the 100 TB
  * shape is "broadcast the benchmark, stream the corpus". What IS
  * state is the MODEL: the eval set and `(dim, threshold)` freeze
  * into `stateDir` on the first batch (the frozen-stamp discipline —
  * a screen whose reference set drifts between batches partitions the
  * corpus inconsistently), every batch scores against the FROZEN set,
  * and a restart passing a different eval set or params fails loudly
  * instead of silently re-partitioning the stream.
  */
object DecontaminateStream {

  /** Start the screen over the bronze file queue. `refs` is the eval
    * reference set in [[Similarity.prep]] form `(id, quantized vec)` —
    * benchmark-sized by contract (it broadcasts into every task as a
    * literal model). */
  def start(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      archiveDir: String,
      stateDir: String,
      passDir: String,
      dropDir: String,
      checkpointDir: String,
      refs: Seq[(Long, Seq[Long])],
      dim: Int,
      threshold: Double,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(refs.nonEmpty, "DecontaminateStream: empty eval reference set")
    val refDir = s"$stateDir/refs"
    val metaDir = s"$stateDir/meta"
    // order-free content digest of the eval set: ids + vector values
    def digestOf(rs: Seq[(Long, Seq[Long])]): Long =
      rs.map { case (id, v) =>
        java.util.Arrays.hashCode((id +: v).toArray).toLong
      }.foldLeft(0L)(_ ^ _)
    FileQueue.start(spark, srcDir, schema, archiveDir, checkpointDir, trigger) {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val fs = new org.apache.hadoop.fs.Path(metaDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(new org.apache.hadoop.fs.Path(metaDir))) {
            // freeze the model on the FIRST generation (deterministic
            // from the caller's refs, so a replay rewrite is stable)
            import spark.implicits._
            refs.toDF("ref_id", "ref_q")
              .write.mode("overwrite").parquet(refDir)
            Seq((dim, threshold, refs.size, digestOf(refs)))
              .toDF("dim", "threshold", "n_refs", "ref_digest")
              .write.mode("overwrite").parquet(metaDir)
          }
          val meta = spark.read.parquet(metaDir).head()
          require(meta.getInt(0) == dim && meta.getDouble(1) == threshold &&
              meta.getInt(2) == refs.size && meta.getLong(3) == digestOf(refs),
            s"DecontaminateStream: screen frozen with dim=${meta.getInt(0)} " +
              s"threshold=${meta.getDouble(1)} n_refs=${meta.getInt(2)} " +
              s"digest=${meta.getLong(3)}, probed with dim=$dim threshold=$threshold " +
              s"n_refs=${refs.size} digest=${digestOf(refs)} — a drifted eval set " +
              "partitions the corpus inconsistently; rebuild the screen instead")
          // score against the FROZEN set (read back, not the argument:
          // the stamp check above proves they agree, and the read keeps
          // the on-disk artifact the single source of truth)
          val frozen = spark.read.parquet(refDir)
            .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq
          val scope = new graft.operators.CacheScope
          try {
            // scored feeds both halves of the split — pin it so the
            // quantize + argmax map runs once per batch
            val scored = scope.pin(Similarity.prep(
                batch.select(col("vec_id"), col("embedding")), col("vec_id"), col("embedding"))
              .withColumn("eval_cos", Similarity.maxCosExpr(frozen, col("q"), col("norm")))
              .select(col("id").as("vec_id"), col("eval_cos")))
            // one narrow map, split by the bar; both halves written so
            // the screen is auditable (stateless: no generations to fold)
            scored.filter(col("eval_cos") < threshold)
              .write.mode("overwrite").parquet(s"$passDir/batch_$batchId")
            scored.filter(col("eval_cos") >= threshold)
              .write.mode("overwrite").parquet(s"$dropDir/batch_$batchId")
          } finally scope.close()
        }
    }
  }
}
