package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Global min-max normalization (reference: `utils/tools.py:67-94`,
  * `min_max_normalize`): map a column to [0,1]; a constant column maps to
  * all-0.0 (the reference's degenerate branch at `tools.py:85-87`).
  *
  * Scale notes: the naive formulation is a `Window` over the whole frame,
  * which funnels everything through ONE partition — unusable at 100 TB.
  * Instead we compute the two scalars with a normal (partial+final)
  * aggregate and broadcast-cross-join the 1-row result back; the data
  * keeps its partitioning and the plan stays fully parallel.
  */
object MinMax {
  def normalize(df: DataFrame, column: String, outColumn: String): DataFrame = {
    val mm = df.agg(min(col(column)).as("__mm_min"), max(col(column)).as("__mm_max"))
    df.crossJoin(broadcast(mm))
      .withColumn(
        outColumn,
        when(col("__mm_max") === col("__mm_min"), lit(0.0))
          .otherwise((col(column) - col("__mm_min")) / (col("__mm_max") - col("__mm_min"))))
      .drop("__mm_min", "__mm_max")
  }
}
