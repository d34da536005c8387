package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Constraints, MatView, Profile, SnapshotDiff, StableAgg}
import graft.operators.Constraints.{References, Satisfies, Unique}

/** Corpus-management queries: single-pass column profiling and
  * CDC-style snapshot diff — the validate-before-train and
  * what-changed-since-last-run primitives of a production data
  * pipeline (operators in [[graft.operators.Profile]] /
  * [[graft.operators.SnapshotDiff]]).
  */
object ProfileQueries extends QueryModule {

  /** One-pass profile of every `orders` column: counts, nulls, exact
    * distinct, typed min/max (timestamps as epoch millis). */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    Profile.columns(Tables.orders(spark, sfDir)).orderBy("column_name")

  /** Diff two deterministic snapshots of `orders`: the old snapshot
    * drops keys ≡3 (mod 10), the new drops keys ≡7 (mod 10) and doubles
    * `o_totalprice` on keys ≡0 (mod 5) — so the diff must classify
    * exactly those keys as added / removed / changed. Money enters the
    * digest through DECIMAL(18,2) and the date through epoch millis
    * (engine-stable renderings; see [[SnapshotDiff]] doc). */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val (oldSnap, newSnap) = snapshotPair(spark, sfDir)
    SnapshotDiff.diff(oldSnap, newSnap, Seq("o_orderkey"), ordersDigest)
      .orderBy("o_orderkey")
  }

  /** The replication ROUND TRIP: reconstruct the new snapshot from the
    * old one plus the payload change feed, and emit the result — the
    * oracle is simply the new snapshot itself, so the whole
    * diff-with-payload → apply machinery must reproduce ground truth
    * row for row. Timestamps leave as epoch millis (engine-stable). */
  def snapshotApply(spark: SparkSession, sfDir: String): DataFrame = {
    val (oldSnap, newSnap) = snapshotPair(spark, sfDir)
    val feed = SnapshotDiff.diffWithPayload(oldSnap, newSnap, Seq("o_orderkey"), ordersDigest)
    SnapshotDiff.applyChanges(oldSnap, feed, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** The deterministic snapshot pair every CDC query in this module
    * shares: old drops keys ≡3 (mod 10); new drops ≡7 (mod 10) and
    * doubles `o_totalprice` on keys ≡0 (mod 5). */
  private def snapshotPair(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val orders = Tables.orders(spark, sfDir)
    val oldSnap = orders.filter(col("o_orderkey") % 10 =!= 3)
    val newSnap = orders.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
    (oldSnap, newSnap)
  }

  private def ordersDigest: Column = SnapshotDiff.rowDigest(Seq(
    col("o_custkey"),
    col("o_orderstatus"),
    col("o_totalprice").cast("decimal(18,2)"),
    unix_millis(col("o_orderdate").cast("timestamp")),
    col("o_orderpriority")))

  /** Incremental MATERIALIZED-VIEW maintenance, delta strategy: a
    * per-(status, priority) count + exact revenue sum view built on the
    * OLD snapshot is rolled forward to the new one purely from the
    * change feed ([[MatView.deltaRefresh]] — base table touched only by
    * a feed-confined semi-join, no re-aggregation). The oracle is the
    * full GROUP BY over the new snapshot, so any delta error — a missed
    * retraction, a double-counted changed key, a group that should have
    * vanished — mismatches. */
  def matviewDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val (oldSnap, newSnap) = snapshotPair(spark, sfDir)
    val keys = Seq("o_orderstatus", "o_orderpriority")
    val sums = Seq("revenue" -> col("o_totalprice").cast("decimal(18,2)"))
    val view = MatView.build(oldSnap, keys, sums)
    val feed = SnapshotDiff.diffWithPayload(oldSnap, newSnap, Seq("o_orderkey"), ordersDigest)
    MatView.deltaRefresh(view, oldSnap, feed, Seq("o_orderkey"), keys, sums)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("cnt").as("n_orders"), col("revenue").cast("double").as("revenue"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** The non-self-maintainable half ([[MatView.affectedRefresh]]):
    * MIN/MAX views survive deletion by recomputing ONLY the groups the
    * feed touches from the new snapshot. The snapshot pair retracts
    * rows (keys ≡7 leave) and changes values (≡0 mod 5 double), so
    * current maxima genuinely disappear — the case delta arithmetic
    * cannot handle. Oracle: full GROUP BY over the new snapshot. */
  def matviewMinmax(spark: SparkSession, sfDir: String): DataFrame = {
    val (oldSnap, newSnap) = snapshotPair(spark, sfDir)
    val keys = Seq("o_orderpriority")
    val aggs = Seq(
      count(lit(1)).as("n_orders"),
      min(col("o_totalprice").cast("decimal(18,2)")).as("min_price"),
      max(col("o_totalprice").cast("decimal(18,2)")).as("max_price"),
      StableAgg.ssum(col("o_totalprice")).as("revenue"))
    val view = MatView.buildAggs(oldSnap, keys, aggs)
    val feed = SnapshotDiff.diffWithPayload(oldSnap, newSnap, Seq("o_orderkey"), ordersDigest)
    MatView.affectedRefresh(view, oldSnap, newSnap, feed, Seq("o_orderkey"), keys, aggs)
      .select(col("o_orderpriority"), col("n_orders"),
        col("min_price").cast("double").as("min_price"),
        col("max_price").cast("double").as("max_price"),
        Rnd.r(col("revenue"), 4).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Declarative data-quality gate ([[Constraints]]) over a
    * deliberately DIRTIED orders frame — nulls injected on keys ≡0
    * (mod 7), duplicate rows for keys ≡0 (mod 5), orphaned negative
    * custkeys on ≡0 (mod 11) — so every rule reports a non-trivial
    * violation count: all row-level rules in ONE aggregate pass, one
    * groupBy for uniqueness, one anti-join for the FK. */
  def constraintsReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    def proj(df: DataFrame) = df.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 11 === 0, -col("o_custkey"))
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      col("o_totalprice"))
    val dirty = proj(orders)
      .unionByName(proj(orders.filter(col("o_orderkey") % 5 === 0)))
    Constraints.check(dirty, Seq(
      Satisfies.notNull("o_orderstatus"),
      Satisfies.isIn("o_orderstatus", Seq("O", "F", "P")),
      Satisfies.inRange("o_totalprice", 1.0, 600000.0),
      Unique(Seq("o_orderkey")),
      References("o_custkey", Tables.customer(spark, sfDir), "c_custkey")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_constraints" -> constraintsReport,
    "q_profile" -> profileOrders,
    "q_snapshot_diff" -> snapshotDiff,
    "q_snapshot_apply" -> snapshotApply,
    "q_matview_delta" -> matviewDelta,
    "q_matview_minmax" -> matviewMinmax)

  /** One UNION ALL leg per orders column, mirroring Profile's typed
    * legs: numeric/timestamp columns fill min_num/max_num (timestamps
    * via epoch millis), string columns fill min_str/max_str. */
  private def profileLeg(name: String, kind: String): String = {
    val (mn, mx, sn, sx) = kind match {
      case "num" => (s"CAST(MIN($name) AS DOUBLE)", s"CAST(MAX($name) AS DOUBLE)",
        "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      case "ts" => (s"CAST(epoch_ms(MIN($name)) AS DOUBLE)",
        s"CAST(epoch_ms(MAX($name)) AS DOUBLE)",
        "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      case "str" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
        s"MIN($name)", s"MAX($name)")
    }
    s"""SELECT '$name' AS column_name,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(*) - COUNT($name) AS BIGINT) AS n_nulls,
       |  CAST(COUNT(DISTINCT $name) AS BIGINT) AS n_distinct,
       |  $mn AS min_num, $mx AS max_num,
       |  $sn AS min_str, $sx AS max_str
       |FROM orders""".stripMargin
  }

  /** One digest field: the netstring length prefix + null sentinel of
    * [[SnapshotDiff.rowDigest]], over an already-VARCHAR expression. */
  private def dfield(e: String): String =
    s"COALESCE(CAST(LENGTH($e) AS VARCHAR) || ':' || ($e), chr(2))"

  private val digestSql =
    s"""md5(concat_ws(chr(1),
       |    ${dfield("CAST(o_custkey AS VARCHAR)")},
       |    ${dfield("o_orderstatus")},
       |    ${dfield("CAST(CAST(__price AS DECIMAL(18,2)) AS VARCHAR)")},
       |    ${dfield("CAST(epoch_ms(o_orderdate) AS VARCHAR)")},
       |    ${dfield("o_orderpriority")}))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_profile" -> Seq(
      profileLeg("o_orderkey", "num"),
      profileLeg("o_custkey", "num"),
      profileLeg("o_orderstatus", "str"),
      profileLeg("o_totalprice", "num"),
      profileLeg("o_orderdate", "ts"),
      profileLeg("o_orderpriority", "str"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    // classification parity needs only WITHIN-engine digest
    // consistency: 'changed' means old and new canonical rows differ,
    // which both engines decide over their own renderings
    "q_snapshot_diff" ->
      s"""WITH oldd AS (
         |  SELECT o_orderkey AS k, ${digestSql.replace("__price", "o_totalprice")} AS d
         |  FROM orders WHERE o_orderkey % 10 <> 3),
         |newd AS (
         |  SELECT o_orderkey AS k, ${digestSql.replace("__price",
                "CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2 ELSE o_totalprice END")} AS d
         |  FROM orders WHERE o_orderkey % 10 <> 7)
         |SELECT COALESCE(o.k, n.k) AS o_orderkey,
         |  CASE WHEN o.k IS NULL THEN 'added'
         |       WHEN n.k IS NULL THEN 'removed'
         |       WHEN o.d <> n.d THEN 'changed' END AS change_type
         |FROM oldd o FULL OUTER JOIN newd n ON o.k = n.k
         |WHERE o.k IS NULL OR n.k IS NULL OR o.d <> n.d
         |ORDER BY o_orderkey""".stripMargin,
    // each constraint leg recomputed independently in SQL over the
    // same dirtied frame; "constraint" needs quoting (reserved word)
    "q_constraints" ->
      """WITH dirty AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN -o_custkey ELSE o_custkey END,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |legs AS (
        |  SELECT 'not_null(o_orderstatus)' AS "constraint",
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
        |    COUNT(*) AS total FROM dirty
        |  UNION ALL
        |  SELECT 'is_in(o_orderstatus)',
        |    CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT),
        |    COUNT(*) FROM dirty
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice,1.0,600000.0)',
        |    CAST(SUM(CASE WHEN o_totalprice >= 1.0 AND o_totalprice <= 600000.0
        |             THEN 0 ELSE 1 END) AS BIGINT),
        |    COUNT(*) FROM dirty
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
        |    COUNT(*) FROM dirty
        |  UNION ALL
        |  SELECT 'references(o_custkey)',
        |    CAST((SELECT COUNT(*) FROM dirty d
        |          WHERE d.o_custkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = d.o_custkey)) AS BIGINT),
        |    COUNT(*) FROM dirty)
        |SELECT "constraint", violations, total,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
        |FROM legs ORDER BY "constraint"""".stripMargin,
    // ground truth for a maintained view IS the full aggregate of the
    // new snapshot — the oracle never sees the delta machinery, so any
    // maintenance error hash-fails
    "q_matview_delta" ->
      """WITH newsnap AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS price
        |  FROM orders WHERE o_orderkey % 10 <> 7)
        |SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(price AS DECIMAL(18,2))), 0) AS DOUBLE) AS revenue
        |FROM newsnap
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_matview_minmax" ->
      s"""WITH newsnap AS (
         |  SELECT o_orderpriority,
         |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
         |         ELSE o_totalprice END AS price
         |  FROM orders WHERE o_orderkey % 10 <> 7)
         |SELECT o_orderpriority,
         |  COUNT(*) AS n_orders,
         |  CAST(MIN(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
         |  CAST(MAX(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
         |  ${Rnd.sql(StableAgg.ssumSql("price"), 4)} AS revenue
         |FROM newsnap
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    // ground truth for the apply round trip IS the new snapshot — no
    // diff machinery on the oracle side at all
    "q_snapshot_apply" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  CAST(epoch_ms(o_orderdate) AS BIGINT) AS order_ms,
        |  o_orderpriority
        |FROM orders WHERE o_orderkey % 10 <> 7
        |ORDER BY o_orderkey""".stripMargin)
}
