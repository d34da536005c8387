package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions.{col, lit, xxhash64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StructField, StructType}

/** Distributed running total (prefix sum) over a total order — the
  * primitive behind sequence PACKING (assigning documents to
  * fixed-token-budget training bins), running byte/row quotas, and
  * monotonic watermark columns.
  *
  * The naive spelling, `sum(v).over(Window.orderBy(...))` with no
  * partition key, funnels the whole frame through ONE task — unusable
  * at scale. This is the two-phase formulation (same shape as
  * [[DenseId]]): range-partition by the order columns and sort within
  * partitions, take each partition's subtotal (one lightweight job over
  * partition tails), prefix-sum the ≤numPartitions subtotals on the
  * driver, and emit per-row running totals with the partition's offset
  * added — every heavy step stays parallel.
  *
  * The value column is summed as Long (token/byte counts — the packing
  * domain); order must be total for deterministic output. Null values
  * contribute 0 — the row keeps its predecessor's running total, like
  * the window spelling's null-skip (the one divergence: a LEADING
  * all-null prefix yields 0 here where the window yields null; the
  * packing domain has no null lengths, and 0 is the saner identity).
  */
object PrefixSum {

  /** Can `dt` participate in a Spark sort? (Maps cannot, at any depth.) */
  private def orderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case ArrayType(e, _) => orderable(e)
    case s: StructType => s.fields.forall(f => orderable(f.dataType))
    case _ => true
  }

  /** Appends `outCol` = inclusive running total of `valueCol` in
    * `orderCols` order.
    *
    * `orderCols` need NOT be a total order: a 128-bit content-hash
    * tiebreaker — two independently-salted `xxhash64`s over every
    * hashable column — is appended to the sort key. Without one, the
    * two passes below (subtotals, then emit) re-sort independently off
    * nondeterministically-ordered shuffle fetches, so rows tied on
    * `orderCols` could interleave differently between passes and
    * produce inconsistent running totals. Two hashed Longs keep the
    * tie comparator O(1) per row — appending the raw columns
    * themselves would drag full document text through every comparator
    * and serialized sort key. Rows that are FULLY identical are
    * interchangeable (any interleaving emits the same (row, total)
    * pairs); DISTINCT rows colliding on both `orderCols` and 128
    * hash bits are a ~2^-128 event — vanishing even at 10^10 tied rows
    * (the 64-bit birthday bound would NOT be: ~0.5 at 5·10^9). Callers
    * with a known unique key should pass it as `tieBreaker` — it
    * skips the content hashing entirely (also required for frames
    * with duplicate column names, which defeat name-based hashing). */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column, outCol: String,
                       tieBreaker: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    // withColumn REPLACES an existing column in place instead of
    // appending — a frame already carrying these names would silently
    // lose the wrong columns to the dropRight below
    require(!df.columns.contains("__v"), "withRunningTotal: column name __v is reserved")
    val tbs: Seq[Column] = tieBreaker match {
      case Some(c) => Seq(c)
      case None =>
        require(df.columns.length == df.columns.distinct.length,
          "withRunningTotal: frame has duplicate column names — pass an explicit tieBreaker")
        // backtick-quote: a raw col("a.b") would parse as struct-field access
        val hashable = df.schema.fields.collect {
          case f if orderable(f.dataType) => col(s"`${f.name.replace("`", "``")}`")
        }.toIndexedSeq
        // two salts → 128 independent-ish bits (see scaladoc collision math)
        Seq(xxhash64(lit(0L) +: hashable: _*), xxhash64(lit(1L) +: hashable.reverse: _*))
    }
    // only the EXACT generated names are reserved (one per tiebreaker
    // column) — a frame's unrelated "__tbx" column stays legal
    tbs.indices.foreach(i => require(!df.columns.contains(s"__tb$i"),
      s"withRunningTotal: column name __tb$i is reserved"))
    val prepared = tbs.zipWithIndex
      .foldLeft(df.withColumn("__v", valueCol.cast("long"))) {
        case (d, (c, i)) => d.withColumn(s"__tb$i", c)
      }
    val appended = 1 + tbs.length // __v + tiebreaker column(s)
    val sorted = prepared.orderBy(orderCols ++ tbs.indices.map(i => col(s"__tb$i")): _*)
    val vIdx = sorted.schema.fieldIndex("__v") // appended before the tiebreakers
    // r19: the hop rides InternalRow (GraftSqlInternal) — Dataset.rdd
    // decoded every row to external objects and createDataFrame paid
    // the encoder back; now each emitted row is one buffer copy plus
    // the appended long, and the working columns drop via a codegen'd
    // projection instead of per-row Seq surgery.
    val rdd = GraftSqlInternal.toInternalRdd(sorted)
    // one pass for per-partition subtotals (runs the sort; the second
    // pass below reuses its shuffle files — see DenseId's note on the
    // same tradeoff)
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator(pid -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = sum of earlier partitions
    val withSchema = StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var running = offsets(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) running += r.getLong(vIdx)
        new JoinedRow(r.copy(), new GenericInternalRow(Array[Any](running))): InternalRow
      }
    }
    GraftSqlInternal.fromInternalRdd(spark, indexed, withSchema)
      .drop("__v" +: tbs.indices.map(i => s"__tb$i"): _*)
  }

  /** [[DenseId.withDenseId]] and [[withRunningTotal]] FUSED over one
    * sorted pass (r18): when a pipeline ranks by some order and then
    * packs by that very rank (the curation rank/pack tail), the
    * two-primitive spelling pays the range sort and the two RDD jobs
    * TWICE — once to assign `pos`, once to accumulate in `pos` order.
    * The running count IS the dense id, so one pass emits both: per
    * partition (row count, value subtotal), offsets folded on the
    * driver, then `idOut` = running row count and `totalOut` = running
    * value total. Identical output to the composition whenever
    * `orderCols` (+ tieBreaker) is the same total order. */
  def withDenseIdAndRunningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                                 idOut: String, totalOut: String,
                                 tieBreaker: Option[Column] = None): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains("__v"),
      "withDenseIdAndRunningTotal: column name __v is reserved")
    val tbs: Seq[Column] = tieBreaker match {
      case Some(c) => Seq(c)
      case None =>
        require(df.columns.length == df.columns.distinct.length,
          "withDenseIdAndRunningTotal: frame has duplicate column names — pass an explicit tieBreaker")
        val hashable = df.schema.fields.collect {
          case f if orderable(f.dataType) => col(s"`${f.name.replace("`", "``")}`")
        }.toIndexedSeq
        Seq(xxhash64(lit(0L) +: hashable: _*), xxhash64(lit(1L) +: hashable.reverse: _*))
    }
    tbs.indices.foreach(i => require(!df.columns.contains(s"__tb$i"),
      s"withDenseIdAndRunningTotal: column name __tb$i is reserved"))
    val prepared = tbs.zipWithIndex
      .foldLeft(df.withColumn("__v", valueCol.cast("long"))) {
        case (d, (c, i)) => d.withColumn(s"__tb$i", c)
      }
    val sorted = prepared.orderBy(orderCols ++ tbs.indices.map(i => col(s"__tb$i")): _*)
    val vIdx = sorted.schema.fieldIndex("__v")
    // InternalRow hop — see [[withRunningTotal]]'s note (r19)
    val rdd = GraftSqlInternal.toInternalRdd(sorted)
    val partStats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; if (!r.isNullAt(vIdx)) s += r.getLong(vIdx) }
      Iterator(pid -> (n, s))
    }.collect().sortBy(_._1).map(_._2)
    val idOffsets = partStats.scanLeft(0L)(_ + _._1)
    val sumOffsets = partStats.scanLeft(0L)(_ + _._2)
    val withSchema = StructType(sorted.schema.fields :+
      StructField(idOut, LongType, nullable = false) :+
      StructField(totalOut, LongType, nullable = false))
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var pos = idOffsets(pid)
      var running = sumOffsets(pid)
      it.map { r =>
        pos += 1
        if (!r.isNullAt(vIdx)) running += r.getLong(vIdx)
        new JoinedRow(r.copy(),
          new GenericInternalRow(Array[Any](pos, running))): InternalRow
      }
    }
    GraftSqlInternal.fromInternalRdd(spark, indexed, withSchema)
      .drop("__v" +: tbs.indices.map(i => s"__tb$i"): _*)
  }

  /** Sequence packing, offset-based: concatenate rows in `orderCols`
    * order and slice the stream at `budget` boundaries — `bin =
    * floor(start_offset / budget)` where `start_offset = running - v`.
    * This is the GPT-style concat-then-slice packing scheme (documents
    * may straddle a sequence boundary; the bin is where the document
    * STARTS), chosen over first-fit because first-fit's close-the-bin
    * decision is inherently sequential while offsets come from the
    * parallel prefix sum above. Emits `outCol` (bin id) and keeps the
    * running total as `<outCol>_end`. */
  def packByBudget(df: DataFrame, orderCols: Seq[Column], valueCol: Column, budget: Long, outCol: String,
                   tieBreaker: Option[Column] = None): DataFrame = {
    require(budget > 0, s"pack budget must be positive, got $budget")
    import org.apache.spark.sql.functions._
    withRunningTotal(df, orderCols, valueCol, s"${outCol}_end", tieBreaker)
      .withColumn(outCol,
        floor((col(s"${outCol}_end") - valueCol.cast("long")) / budget).cast("long"))
  }
}
