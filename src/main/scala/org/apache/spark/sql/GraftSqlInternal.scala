package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-located bridge to two `private[sql]` session internals, so
  * the engine's RDD-hop primitives ([[graft.operators.DenseId]],
  * [[graft.operators.PrefixSum]]) can ride `InternalRow` end to end.
  *
  * Why: `Dataset.rdd` converts every row to an EXTERNAL `Row` (decoding
  * every UTF8String to java.lang.String, boxing every value) and
  * `createDataFrame(RDD[Row], schema)` pays the full encoder on the way
  * back — measured as the dominant cost of the curation rank/pack tail
  * (23.5 s of task time at sf0.1, three stages). `queryExecution.toRdd`
  * + `internalCreateDataFrame` keep rows in the internal format: the
  * only remaining per-row work is one buffer copy (required — unsafe
  * row buffers are reused by the scan iterator) plus the appended
  * columns.
  *
  * Spark-source-level API only (the same mechanism Spark's own modules
  * use); no reflection, no behavior override.
  */
object GraftSqlInternal {
  /** The frame's physical execution as internal rows. Rows are only
    * valid until the iterator advances — `copy()` before retaining. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** A DataFrame over already-internal rows (no encoder pass). The rows
    * must be immutable (copied) and match `schema` positionally. Spark
    * 4 keeps the implementation on the `classic` session (every session
    * this engine builds is one). */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
