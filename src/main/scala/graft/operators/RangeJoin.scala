package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match points to the intervals containing them
  * — attribution windows, validity periods, IP/range lookups — with NO
  * equi-key. Spark plans a raw inequality join as BroadcastNestedLoop
  * (all-pairs — a scale-killer), so this is the standard BUCKETED
  * formulation: quantize time into coarse buckets, equi-join on the
  * bucket id, and re-check the exact predicate as a residual filter.
  *
  * Cost model: points map to exactly ONE bucket (never replicated);
  * each interval replicates to the ceil(len/width)+1 buckets it
  * overlaps. The join is then a plain shuffled equi-join — hash
  * partitioned, AQE-skew-splittable — whose fan-out is bounded by
  * per-bucket density instead of |points| × |intervals|. Pick
  * `bucketWidthSec` near the TYPICAL interval length: wider buckets
  * mean fewer interval replicas but more residual-filtered pairs;
  * narrower the reverse.
  */
object RangeJoin {

  /** Pairs of (point row, interval row) with
    * `startTs <= pointTs < endTs` (half-open, the time-window
    * convention). Column names of `points` and `intervals` must be
    * disjoint; rows with null timestamps never match (as in any join).
    */
  def pointInInterval(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0, s"bucketWidthSec must be positive, got $bucketWidthSec")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval: point/interval column names must be disjoint, both have: ${overlap.mkString(", ")}")
    val w = bucketWidthSec * 1000000L // micros
    val p = points.withColumn("__b", floor(unix_micros(col(pointTs)) / w))
    val i = intervals.withColumn("__b",
      // the buckets [start, end) overlaps; end is exclusive so the last
      // covered instant is end - 1us. Degenerate intervals (end <= start)
      // can match nothing — emit no buckets rather than let sequence()
      // DESCEND and replicate junk the residual would have to kill.
      explode(
        when(col(endTs) > col(startTs),
          sequence(
            floor(unix_micros(col(startTs)) / w),
            floor((unix_micros(col(endTs)) - 1) / w)))
          .otherwise(array().cast("array<bigint>"))))
    p.join(i, Seq("__b"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__b")
  }
}
