package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlInternal}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** P2 — 1-based dense row index (reference: `llama_cpp_client.py:19-21`
  * `pl.arange(1, height+1)`, Go `ind+1` at `extractor.go:107-113`).
  *
  * The obvious Spark spelling, `row_number().over(Window.orderBy(...))`,
  * funnels the entire frame through ONE partition — unusable at 100 TB.
  * Instead: a distributed range-partitioned sort, then `zipWithIndex`,
  * which runs one lightweight job to count per-partition sizes and then
  * assigns offsets per partition in parallel. Total order (and therefore
  * the ids) is deterministic as long as `orderCols` is a total ordering;
  * rows that tie on every order column are interchangeable, so any
  * id assignment among them yields the same result set.
  *
  * The RDD hop deliberately breaks whole-stage codegen at this point —
  * the unavoidable price of a dense index; use
  * `monotonically_increasing_id()` when density is not required. r19:
  * the hop rides `InternalRow` (via [[GraftSqlInternal]]) — the old
  * `Dataset.rdd` spelling decoded every row to external objects (every
  * string to java.lang.String) and paid the full encoder back; now the
  * per-row cost is one buffer copy plus the appended long.
  */
object DenseId {
  def withDenseId(df: DataFrame, orderCols: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val outSchema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    // zipWithIndex launches a partition-count job that executes the
    // sort, and the downstream consumer executes it again. Measured
    // tradeoff: persisting the sorted RDD to dodge the second sort
    // costs MORE than re-sorting (row caching is ~5× the sort at
    // sf0.1) — so accept the two sorts; they are pure shuffle-exchange
    // work that scales linearly.
    val indexed = GraftSqlInternal.toInternalRdd(sorted).zipWithIndex().map {
      case (row, i) =>
        // copy: unsafe row buffers are reused by the scan iterator
        new JoinedRow(row.copy(),
          new GenericInternalRow(Array[Any](i + 1L))): org.apache.spark.sql.catalyst.InternalRow
    }
    GraftSqlInternal.fromInternalRdd(sorted.sparkSession, indexed, outSchema)
  }
}
