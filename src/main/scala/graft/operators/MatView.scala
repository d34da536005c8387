package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: keep a grouped aggregate
  * of a snapshot table up to date from a [[SnapshotDiff.diffWithPayload]]
  * change feed, WITHOUT re-aggregating the base table.
  *
  * At 100 TB this is the difference between a stats refresh that costs
  * O(changed rows) and one that costs a corpus pass: a day's CDC feed is
  * typically a fraction of a percent of the table, and both refresh
  * strategies below confine every join to that fraction.
  *
  * Two maintenance strategies, chosen by what the view aggregates:
  *
  *   - [[deltaRefresh]] — pure delta arithmetic for SELF-MAINTAINABLE
  *     aggregates (COUNT, SUM, and AVG derived as SUM/COUNT): old
  *     contributions of changed/removed keys subtract, new contributions
  *     of added/changed keys add. The base table is touched only by a
  *     change-set-confined semi-join (the old rows of changed keys);
  *     groups whose count reaches 0 vanish, new groups appear. Cost is
  *     O(|feed|) + a view-sized merge join — never a base scan.
  *
  *   - [[affectedRefresh]] — for aggregates that are NOT self-
  *     maintainable under deletion (MIN/MAX: retracting the current
  *     maximum says nothing about the runner-up): recompute ONLY the
  *     groups the feed touches from the new snapshot and splice them
  *     into the view. Cost is O(rows of affected groups) — with the
  *     base laid out clustered on the group key (writeClustered /
  *     zone maps) that read is file-pruned, so it stays far below a
  *     corpus pass.
  *
  * Exactness contract: pass SUM inputs pre-cast to DECIMAL (the
  * [[StableAgg]] rule) so delta add/subtract is exact — double sums
  * would drift away from a from-scratch rebuild by accumulation-order
  * ulps and break the `refresh == rebuild` invariant the spec pins.
  *
  * The view schema is `groupKeys ++ (cnt, sumAliases...)`; refresh
  * output casts every maintained column back to the incoming view's
  * type, so a view can be refreshed indefinitely (schema is a fixed
  * point — pinned in MatViewSpec).
  */
object MatView {

  /** Aggregate spec: output alias -> per-row input expression (summed
    * by the view). Cast doubles to DECIMAL here (see class doc). */
  type Sums = Seq[(String, Column)]

  private val Cnt = "cnt"

  private def checkNames(groupKeys: Seq[String], sums: Sums): Unit = {
    val aliases = sums.map(_._1)
    require(!(groupKeys :+ Cnt).exists(aliases.contains),
      s"MatView: sum aliases ${aliases.mkString(",")} must not collide with group keys or '$Cnt'")
    require(!groupKeys.contains(Cnt),
      s"MatView: '$Cnt' is reserved for the maintained row count")
  }

  /** Build the view from scratch: `groupKeys..., cnt, sums...`. The
    * one full aggregate an incremental view ever pays for.
    *
    * A group whose sum inputs are all null renders as 0, not SQL's
    * NULL: delta arithmetic cannot tell an emptied sum from a genuine
    * zero (that would need a per-column non-null count), so the view
    * commits to exact-sum semantics and [[deltaRefresh]] preserves
    * them. Mirror with `COALESCE(SUM(x), 0)` on an oracle side. */
  def build(snap: DataFrame, groupKeys: Seq[String], sums: Sums): DataFrame = {
    checkNames(groupKeys, sums)
    snap.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as(Cnt),
        sums.map { case (a, c) => coalesce(sum(c), lit(0)).as(a) }: _*)
  }

  /** Merge a [[SnapshotDiff.diffWithPayload]] feed into `view`.
    *
    * `oldSnap` is the snapshot the view currently reflects (read only
    * through a feed-confined semi-join — the old contributions of
    * changed/removed keys); `feed` carries `rowKeys, change_type` plus
    * the NEW payload columns. Equivalent to `build(newSnap, ...)`,
    * exactly (generatively pinned in MatViewProps). */
  def deltaRefresh(view: DataFrame, oldSnap: DataFrame, feed: DataFrame,
                   rowKeys: Seq[String], groupKeys: Seq[String],
                   sums: Sums): DataFrame = {
    // the feed's key set is the changed fraction — broadcast it so the
    // base-table semi-join ships no base rows at all
    val retractKeys = broadcast(
      feed.filter(col("change_type").isin("removed", "changed"))
        .select(rowKeys.map(col): _*))
    refreshFromRows(view,
      oldSnap.join(retractKeys, rowKeys, "left_semi"),
      feed.filter(col("change_type") =!= "removed"),
      groupKeys, sums)
  }

  /** The delta-merge core: subtract `minusRows`' contributions, add
    * `plusRows`' — the leg [[deltaRefresh]] (rows from the old
    * snapshot) and [[graft.streaming.MatViewStream]] (rows from the
    * persisted state table, no base access at all) share. */
  def refreshFromRows(view: DataFrame, minusRows: DataFrame, plusRows: DataFrame,
                      groupKeys: Seq[String], sums: Sums): DataFrame = {
    checkNames(groupKeys, sums)
    require(!minusRows.columns.contains("__w") && !plusRows.columns.contains("__w"),
      "MatView: column name __w is reserved")
    val minus = minusRows.withColumn("__w", lit(-1L))
    val plus = plusRows.withColumn("__w", lit(1L))
    // group deltas: one narrow union of the two change-row sets; sums
    // stay exact because weight * DECIMAL is DECIMAL
    val proj = (df: DataFrame) => df.select(
      groupKeys.map(col) ++ (("__w", col("__w")) +: sums.toSeq).map {
        case (a, c) => c.as(a) }: _*)
    val deltas = proj(minus).unionByName(proj(plus))
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("__w")).as("__dcnt"),
        sums.map { case (a, c) => sum(col("__w") * col(a)).as(s"__d_$a") }: _*)
    // view-sized merge: full-outer on the group keys, add deltas, drop
    // emptied groups; cast back to the view's types so the schema is a
    // fixed point across refreshes
    val viewTypes = view.schema.map(f => f.name -> f.dataType).toMap
    view.join(deltas, groupKeys, "full_outer")
      .select(groupKeys.map(col) ++ Seq(
        (coalesce(col(Cnt), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
          .cast(viewTypes(Cnt)).as(Cnt)) ++
        sums.map { case (a, _) =>
          (coalesce(col(a), lit(0)) + coalesce(col(s"__d_$a"), lit(0)))
            .cast(viewTypes(a)).as(a) }: _*)
      .filter(col(Cnt) > 0)
  }

  /** Refresh for aggregates that deletion breaks (MIN/MAX & friends):
    * recompute the feed-touched groups from `newSnap`, keep every other
    * view row untouched. `aggs` are full aggregate expressions (e.g.
    * `min(col("x")).as("min_x")`); the view is `build`-shaped with
    * `buildAggs(snap, groupKeys, aggs)`.
    *
    * The affected-group set needs the OLD group of changed/removed rows
    * too (a row MOVING between groups must shrink its old group), hence
    * the `oldSnap` semi-join — again confined to the feed's keys. */
  def affectedRefresh(view: DataFrame, oldSnap: DataFrame, newSnap: DataFrame,
                      feed: DataFrame, rowKeys: Seq[String],
                      groupKeys: Seq[String],
                      aggs: Seq[Column]): DataFrame = {
    val retractKeys = broadcast(
      feed.filter(col("change_type").isin("removed", "changed"))
        .select(rowKeys.map(col): _*))
    val affected = broadcast(
      oldSnap.join(retractKeys, rowKeys, "left_semi")
        .select(groupKeys.map(col): _*)
        .unionByName(feed.filter(col("change_type") =!= "removed")
          .select(groupKeys.map(col): _*))
        .distinct())
    // on a group-clustered base layout this semi-join is the pruned
    // read; everything downstream is affected-group-sized
    val recomputed = newSnap.join(affected, groupKeys, "left_semi")
      .groupBy(groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    view.join(affected, groupKeys, "left_anti")
      .unionByName(recomputed)
  }

  /** [[build]] for arbitrary aggregate expressions — the from-scratch
    * counterpart of [[affectedRefresh]]. */
  def buildAggs(snap: DataFrame, groupKeys: Seq[String],
                aggs: Seq[Column]): DataFrame =
    snap.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
}
