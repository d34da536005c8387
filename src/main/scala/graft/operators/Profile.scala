package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiler — the data-validation step a training
  * pipeline runs before pointing a 100 TB corpus at a trainer: per
  * column, row/null/distinct counts plus typed min/max, in ONE pass
  * over the data.
  *
  * Scale design: counts and typed min/max for all columns ride a single
  * distinct-free global aggregate (a hash fold — string MIN/MAX inside a
  * GROUPED aggregate would force sort aggregation, and multi-distinct
  * would plan an Expand replicating every row k+1 times; both measured
  * and removed in r18). Exact distincts run as one two-level hash
  * aggregate per column — map-side partial dedup, the exchange carries
  * each column's distinct values once, and each leg's columnar scan
  * reads only its own column, so the k single-column passes cost the
  * same bytes as one k-column pass. That is the right trade for
  * dimension-like columns; for high-cardinality columns (ids, free
  * text) use [[columnsApprox]], whose HLL sketches keep the shuffle at
  * KB per column in ONE aggregate.
  *
  * Output is long format, one row per column:
  * `(column_name, n_rows, n_nulls, n_distinct, min_num, max_num,
  * min_str, max_str)` — numeric legs null for string columns and vice
  * versa. Numeric legs are doubles; timestamps profile as epoch
  * milliseconds (exact in a double through 2^53); both choices keep
  * the output engine-portable.
  */
object Profile {

  /** Exact profile of `cols` (default: every column).
    *
    * r18 optimization (guide §2.3/§2.4): the one-aggregate multi-distinct
    * spelling planned an Expand (k+1 replicas of every row) and — because
    * string MIN/MAX have variable-width buffers — SORT aggregates, so the
    * "single pass" really sorted (k+1)·n wide rows twice (measured 3.5 s
    * at sf0.1; the repo had already measured the same Expand penalty in
    * q_approx_distinct_bound: 4.6 s vs 1.3 s for the pre-distinct shape).
    * Now: ONE distinct-free global aggregate (counts + typed min/max — a
    * fold, hash-aggregated, no sort) plus ONE two-level hash aggregate
    * per column for its exact distinct count (map-side partial dedup —
    * the exchange carries each column's distinct values once, exactly
    * what the Expand exchange carried, without the k+1-replica scan
    * above it). Each distinct leg scans only its own column (columnar
    * scan: the k single-column passes read the same bytes as one
    * k-column pass), and the k+1 one-row results cross-join back
    * broadcast. Same output, same engine-portable renderings. */
  def columns(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val want = if (cols.isEmpty) df.schema.fieldNames.toSeq else cols
    val fields = want.map(n => df.schema(n))
    fields.foreach(f => require(!f.name.contains("`"),
      s"Profile: column name with backtick unsupported: ${f.name}"))
    val base = {
      val aggs = count(lit(1)).as("__n") +: fields.zipWithIndex.flatMap { case (f, i) =>
        val c = col(s"`${f.name}`")
        val (num, str) = legs(f, c)
        Seq(
          count(c).as(s"__nn_$i"),
          num.map(min).getOrElse(lit(null).cast("double")).as(s"__mn_$i"),
          num.map(max).getOrElse(lit(null).cast("double")).as(s"__mx_$i"),
          str.map(min).getOrElse(lit(null).cast("string")).as(s"__sn_$i"),
          str.map(max).getOrElse(lit(null).cast("string")).as(s"__sx_$i"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }
    val withNd = fields.zipWithIndex.foldLeft(base) { case (acc, (f, i)) =>
      val c = col(s"`${f.name}`")
      // distinct non-null values of the one column, then count them:
      // a two-level hash aggregate (strings group fine; only MIN/MAX
      // string BUFFERS force sort aggregates), partial-deduped map-side
      acc.crossJoin(broadcast(
        df.select(c).distinct().agg(count(c).as(s"__nd_$i"))))
    }
    val entries = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column_name"),
        col(s"__nn_$i").as("nn"), col(s"__nd_$i").as("nd"),
        col(s"__mn_$i").as("mn"), col(s"__mx_$i").as("mx"),
        col(s"__sn_$i").as("sn"), col(s"__sx_$i").as("sx"))
    }
    withNd
      .select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.column_name").as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("e.nn")).as("n_nulls"),
        col("e.nd").as("n_distinct"),
        col("e.mn").as("min_num"),
        col("e.mx").as("max_num"),
        col("e.sn").as("min_str"),
        col("e.sx").as("max_str"))
  }

  /** Profile with `approx_count_distinct` (HyperLogLog++, default rsd
    * 5%) in place of the exact distinct: a plain single aggregate — no
    * Expand, KB-sized sketch partials per column — for corpora whose id
    * or text columns would make the exact exchange carry the column's
    * whole value domain. Not DuckDB-oracle-able (estimator-specific);
    * ProfileSpec bounds it against [[columns]]. */
  def columnsApprox(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    profile(df, cols, (_, c) => approx_count_distinct(c))

  /** MERGEABLE profile slice: identical to [[columnsApprox]] but the
    * distinct leg is the raw Datasketches HLL sketch (`nd_sketch`
    * BINARY) instead of a point estimate. Profile each corpus slice
    * (day, partition, ingest batch) once, store the KB-per-column
    * result, and [[mergeProfiles]] combines any subset WITHOUT
    * rescanning data — the incremental statistics pattern: at 100 TB
    * a full-history profile refresh costs slices × columns ROWS, not a
    * corpus pass. The sketch hashes a canonical per-type encoding
    * (integrals as long, strings as-is, fractional/temporal as the
    * canonical double's text — Datasketches HLL takes no double
    * input), fixed per column, so slice sketches union losslessly. */
  def columnsSketch(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    profile(df, cols, (f, c) => hll_sketch_agg(sketchInput(f, c)),
      ndName = "nd_sketch")

  /** Canonical sketch-domain encoding per column type. */
  private def sketchInput(f: StructField, c: Column): Column = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType => c.cast("long")
    case _: StringType => c
    // decimals sketch their EXACT text — the double path would collapse
    // values that differ beyond 53-bit precision into one sketch entry
    case _: DecimalType => c.cast("string")
    case _ => legs(f, c)._1.getOrElse(throw new IllegalArgumentException(
      s"Profile: unsupported type ${f.dataType.simpleString} for column ${f.name}"))
      .cast("string")
  }

  /** Merge [[columnsSketch]] slices (a union of slice outputs) into the
    * [[columnsApprox]]-shaped whole-corpus profile: counts add, min/max
    * fold, sketches union then estimate. One tiny aggregate over
    * slices × columns rows. */
  def mergeProfiles(slices: DataFrame): DataFrame =
    slices.groupBy("column_name")
      .agg(
        sum("n_rows").as("n_rows"),
        sum("n_nulls").as("n_nulls"),
        // all-null slices carry a null sketch; estimate then reads 0
        // distinct values, matching the exact path
        coalesce(hll_sketch_estimate(hll_union_agg(col("nd_sketch"))), lit(0L))
          .as("n_distinct"),
        min("min_num").as("min_num"),
        max("max_num").as("max_num"),
        min("min_str").as("min_str"),
        max("max_str").as("max_str"))
      .select("column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str")

  /** How one column enters the numeric or string min/max leg. */
  private def legs(f: StructField, c: Column): (Option[Column], Option[Column]) = f.dataType match {
    case _: NumericType => (Some(c.cast("double")), None)
    // epoch millis, not CAST(ts AS STRING): integer rendering is
    // engine-stable, timestamp/date-to-text formatting is not. NTZ and
    // DATE convert through the session timezone — pinned UTC in every
    // harness session — which matches DuckDB's naive-as-UTC epoch_ms.
    case _: TimestampType | _: TimestampNTZType | _: DateType =>
      (Some(unix_millis(c.cast("timestamp")).cast("double")), None)
    case _: StringType => (None, Some(c))
    case other => throw new IllegalArgumentException(
      s"Profile: unsupported type ${other.simpleString} for column ${f.name}")
  }

  private def profile(df: DataFrame, cols: Seq[String],
                      distinctAgg: (StructField, Column) => Column,
                      ndName: String = "n_distinct"): DataFrame = {
    val want = if (cols.isEmpty) df.schema.fieldNames.toSeq else cols
    val fields = want.map(n => df.schema(n))
    // generated identifiers are INDEX-based and input references are
    // backquoted, so dotted column names (flattened JSON) profile fine;
    // a backtick in a name would break its own quoting — reject it
    fields.foreach(f => require(!f.name.contains("`"),
      s"Profile: column name with backtick unsupported: ${f.name}"))
    val aggs = count(lit(1)).as("__n") +: fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"`${f.name}`")
      val (num, str) = legs(f, c)
      Seq(
        count(c).as(s"__nn_$i"),
        distinctAgg(f, c).as(s"__nd_$i"),
        num.map(min).getOrElse(lit(null).cast("double")).as(s"__mn_$i"),
        num.map(max).getOrElse(lit(null).cast("double")).as(s"__mx_$i"),
        str.map(min).getOrElse(lit(null).cast("string")).as(s"__sn_$i"),
        str.map(max).getOrElse(lit(null).cast("string")).as(s"__sx_$i"))
    }
    // pivot the single wide aggregate row to one row per column —
    // driver-trivial (the frame is exactly one row by construction);
    // uniform struct field names make the array element types unify
    val entries = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("column_name"),
        col(s"__nn_$i").as("nn"), col(s"__nd_$i").as("nd"),
        col(s"__mn_$i").as("mn"), col(s"__mx_$i").as("mx"),
        col(s"__sn_$i").as("sn"), col(s"__sx_$i").as("sx"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(entries: _*)).as("e"))
      .select(
        col("e.column_name").as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("e.nn")).as("n_nulls"),
        col("e.nd").as(ndName),
        col("e.mn").as("min_num"),
        col("e.mx").as("max_num"),
        col("e.sn").as("min_str"),
        col("e.sx").as("max_str"))
  }
}
