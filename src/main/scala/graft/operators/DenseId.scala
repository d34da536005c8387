package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}

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
  * The hop through `RDD[Row]` deliberately breaks whole-stage codegen at
  * this point — that is the unavoidable price of a dense index; use
  * `monotonically_increasing_id()` when density is not required.
  */
object DenseId {
  def withDenseId(df: DataFrame, orderCols: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val outSchema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol, LongType, nullable = false))
    // zipWithIndex launches a partition-count job that executes the
    // sort, and the downstream consumer executes it again. Measured
    // tradeoff: persisting the sorted RDD to dodge the second sort
    // costs MORE than re-sorting (deserialized Row caching is ~5× the
    // sort at sf0.1) — so accept the two sorts; they are pure
    // shuffle-exchange work that scales linearly.
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(indexed, outSchema)
  }
}
