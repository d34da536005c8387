package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A6 — per-file consumption accounting (`data_transformer.py:77-88`,
  * state in `models_schema.py:31-33`): track how many of each source
  * file's rows have been processed; a file whose count reaches zero is
  * ready to archive (K5), failures stay queued for retry
  * (`data_loader.py:46-51`).
  *
  * One hash aggregate on the file column — the conditional count is
  * map-side partial, so the shuffle carries one row per (partition,
  * file), not per record.
  */
object FileAccounting {

  /** Per-file totals vs processed rows. `fileCol` is typically
    * `input_file_name()` (batch) or a carried source column. */
  def consumption(df: DataFrame, fileCol: Column, processedFlag: Column): DataFrame =
    df.groupBy(fileCol.as("file"))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(processedFlag, 1).otherwise(0)).cast("long").as("processed"))
      .withColumn("consumed", col("rows") === col("processed"))

  /** The K5 handoff: fully-consumed files, ready to move. */
  def consumedFiles(accounting: DataFrame): Seq[String] =
    accounting.filter(col("consumed")).select("file").collect().map(_.getString(0)).toSeq
}
