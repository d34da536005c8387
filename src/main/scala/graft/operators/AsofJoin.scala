package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the point-in-time lookup every feature/training pipeline
  * needs: for each left row, the MOST RECENT right row of the same key
  * with `rightTs <= leftTs` (e.g. "the state of this account when the
  * event happened"). Left rows with no prior right row keep nulls
  * (left-join semantics).
  *
  * Spark has no native as-of operator, and the naive spelling —
  * inequality join + per-pair max — explodes to |left| × |right-per-key|
  * intermediate rows. This is the SORT-MERGE formulation instead: tag
  * and union both sides, then one window per key ordered by (ts, side)
  * carries the latest right-side values forward onto the left rows
  * (`last(..., ignoreNulls)` over an unbounded-preceding frame). Cost is
  * one shuffle per side on the key and a per-KEY window (bounded, fully
  * parallel — never a whole-frame window); intermediate size is
  * |left| + |right|, independent of match fan-out. This is how as-of
  * joins are executed at scale everywhere (kdb, QuestDB, Flink temporal
  * joins); a hot key skews its window partition like any keyed shuffle —
  * salt upstream if one key dominates.
  */
object AsofJoin {

  /** For each row of `left`, append `carry` columns from the latest
    * `right` row with the same key and `rightTs <= leftTs` (inclusive;
    * null-keyed rows never match, like any join).
    *
    * `right` must be unique per (key, ts) — pre-aggregate ties first so
    * "latest" is well-defined (with tied right rows the carried values
    * would depend on physical row order). `carry` names must not collide
    * with `left`'s columns.
    */
  def asofLast(
      left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(carry.nonEmpty, "asofLast: nothing to carry from the right side")
    require(!carry.exists(leftCols.contains),
      s"asofLast: carry columns collide with left columns: ${carry.filter(leftCols.contains).mkString(", ")}")
    def nullAs(df: DataFrame, c: String): Column = lit(null).cast(df.schema(c).dataType).as(c)
    // side 0 = right, 1 = left: at equal timestamps the right row sorts
    // FIRST, so rightTs == leftTs matches (the "at or before" contract)
    val lTagged = left.select(
      col(leftKey).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        (leftCols.map(col) ++ carry.map(nullAs(right, _))): _*)
    // null never equals null in a join: a null-keyed right row must not
    // feed the null window partition (where null-keyed LEFT rows live,
    // kept but unmatched)
    val rTagged = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
        (leftCols.map(nullAs(left, _)) ++ carry.map(col)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // left rows tied on (__t, __side) see a nondeterministic frame cut
    // among THEMSELVES, but left rows carry only nulls — ignoreNulls
    // last() skips them, so every tied row still reads the same latest
    // right-side values
    val carried = carry.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ carry).map(col): _*)
  }
}
