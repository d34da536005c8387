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
  * carries the latest right row forward onto the left rows
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
    * null keys or null timestamps never match, like any join/comparison).
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
    // The carried payload is ONE non-null STRUCT per right row, not
    // independent columns: per-column last(ignoreNulls) could not tell a
    // left row's tagged null from a genuine null in the matching right
    // row — it would resurrect a STALE value from an older right row,
    // and with several carry columns even stitch together a combination
    // that exists in no right row. The struct is non-null exactly on
    // right rows, so ignoreNulls skips left rows and nothing else; a
    // null FIELD inside the latest right row survives as null.
    val carryStructType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c).copy(name = c)))
    // side 0 = right, 1 = left: at equal timestamps the right row sorts
    // FIRST, so rightTs == leftTs matches (the "at or before" contract)
    val lTagged = left.select(
      col(leftKey).as("__k") +: col(leftTs).as("__t") +: lit(1).as("__side") +:
        lit(null).cast(carryStructType).as("__carry") +: leftCols.map(col): _*)
    // null never equals null in a join, and a null timestamp satisfies
    // no `rightTs <= leftTs`: such right rows must not feed the window
    // (a null __t would sort FIRST and its payload would be carried onto
    // every row of its key partition)
    val rTagged = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("__k") +: col(rightTs).as("__t") +: lit(0).as("__side") +:
          struct(carry.map(col): _*).as("__carry") +:
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // left rows tied on (__t, __side) see a nondeterministic frame cut
    // among THEMSELVES, but left rows carry a null struct — ignoreNulls
    // last() skips them, so every tied row still reads the same latest
    // right row
    lTagged.unionByName(rTagged)
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carry.map(c => col("__carry").getField(c).as(c)): _*)
  }
}
