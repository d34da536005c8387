package graft.queries

import graft.Tables
import graft.operators.{AsofJoin, RangeJoin, StableAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join extension family (beyond the reference surface, per the
  * training-pipeline north star): as-of join (point-in-time lookup —
  * what feature stores call temporal correctness) and bucketed range
  * join (interval attribution). Both oracled against DuckDB's native
  * ASOF JOIN / inequality join, so the bucketing and window mechanics
  * are value-checked end to end.
  */
object JoinQueries extends QueryModule {

  /** Each event annotated with the customer's most recent order at/
    * before the event: the classic point-in-time feature lookup. Orders
    * are pre-aggregated per (customer, date) so "latest" is tie-free. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val lastOrders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max("o_totalprice").as("last_order_price"))
      .withColumn("last_order_ts", col("o_orderdate"))
    AsofJoin.asofLast(
      events, "user_id", "ts",
      lastOrders, "o_custkey", "o_orderdate",
      carry = Seq("last_order_ts", "last_order_price"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        date_format(col("last_order_ts"), "yyyy-MM-dd").as("last_order_date"),
        Rnd.r(col("last_order_price"), 2).as("last_order_price"))
      .orderBy("event_id")
  }

  /** Every purchase opens a 2-hour attribution window; count and total
    * ALL events landing in each window — a keyless interval join (the
    * bucket width matches the window length, so each interval visits at
    * most 2 buckets). */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val windows = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("anchor_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
    // r18 optimization: the aggregation-shaped member — the consumer
    // only needs COUNT/SUM per window, so the quadratic pair set
    // ([[RangeJoin.pointInInterval]] + groupBy: 5.6M pairs at sf0.1,
    // the registry's one super-linear query) never materializes; the
    // prefix-difference form is O((n+m) log). Result-identical: the
    // decimal prefix sums reproduce StableAgg.ssum exactly (oracle
    // unchanged, still the brute-force inequality join in DuckDB).
    RangeJoin.intervalCountSum(
      events.select(col("ts"), col("value")), "ts", col("value"),
      windows, "w_start", "w_end",
      bucketWidthSec = 2 * 3600)
      .select(col("anchor_id"), col("n_points").as("n_events"),
        Rnd.r(col("sum_value").cast("double"), 2).as("total_value"))
      .orderBy("anchor_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> asofJoin,
    "q_range_join" -> rangeJoin)

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      s"""WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS last_order_price
         |  FROM orders GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id,
         |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
         |  strftime(o.o_orderdate, '%Y-%m-%d') AS last_order_date,
         |  ${Rnd.sql("o.last_order_price", 2)} AS last_order_price
         |FROM events e ASOF LEFT JOIN o
         |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
         |ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      s"""WITH w AS (SELECT event_id AS anchor_id, ts AS w_start,
         |    ts + INTERVAL 2 HOUR AS w_end
         |  FROM events WHERE event_type = 'purchase')
         |SELECT w.anchor_id, COUNT(*) AS n_events,
         |  ${Rnd.sql(StableAgg.ssumSql("e.value"), 2)} AS total_value
         |FROM w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
         |GROUP BY w.anchor_id ORDER BY anchor_id""".stripMargin)
}
