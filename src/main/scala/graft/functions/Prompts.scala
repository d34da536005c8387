package graft.functions

import graft.operators.Enrich
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F1 — prompt templating fold (`utils/tools.py:51-64`,
  * `enricher.go:39-45`): render each item as a line and fold a batch's
  * lines into one prompt string, in item order.
  *
  * One hash aggregate; the per-batch sort is an `array_sort` over ≤
  * batchSize collected structs (bounded memory per group, no window, no
  * global sort).
  */
object Prompts {

  /** One row per batch: (batch_id, prompt) where prompt = the batch's
    * `lineCol` strings joined by `\n` in ascending `idCol` order. */
  def fold(df: DataFrame, idCol: Column, lineCol: Column, batchSize: Int): DataFrame =
    df.withColumn("__line", lineCol)
      .withColumn("batch_id", Enrich.batchId(idCol, batchSize))
      .groupBy("batch_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(idCol.as("i"), col("__line").as("line")))),
            x => x.getField("line")),
          "\n").as("prompt"))
}
