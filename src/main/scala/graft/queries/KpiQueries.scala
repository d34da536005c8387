package graft.queries

import graft.Tables
import graft.operators.{Kpis, MinMax, StableAgg}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness bindings for the reference KPI family (SURVEY.md §2.5 A1-A5,
  * §2.4 J2, §2.3 P4-P7) with DuckDB oracle mirrors.
  *
  * Float outputs are rounded in BOTH engines with the bit-deterministic
  * [[Rnd]] formula (6 digits for averages/ratios, 2 for large sums) so the
  * driver's hash compare is stable across engines and summation orders
  * (SURVEY.md §7.4).
  */
object KpiQueries extends QueryModule {

  private[queries] def kpiTail(keyCol: String, avgOut: String): String =
    s"""sc AS (SELECT *, CAST(positive_reviews AS DOUBLE) /
       |  (CASE WHEN negative_reviews > 0 THEN negative_reviews ELSE 1 END) AS lk FROM agg),
       |mm AS (SELECT MIN(lk) AS mn, MAX(lk) AS mx FROM sc)
       |SELECT $keyCol, ${Rnd.sql("avg_raw", 6)} AS $avgOut, positive_reviews, negative_reviews,
       |  ${Rnd.sql("lk", 6)} AS likeness_score,
       |  ${Rnd.sql("CASE WHEN mx = mn THEN 0.0 ELSE (lk - mn) / (mx - mn) END", 6)}
       |    AS normalized_likeness_score
       |FROM sc, mm ORDER BY $keyCol""".stripMargin

  /** Shared Spark-side tail: round the float columns, fix column order, sort. */
  private[queries] def finish(df: DataFrame, key: String, avgOut: String): DataFrame =
    df.select(
        col(key),
        Rnd.r(col(avgOut), 6).as(avgOut),
        col("positive_reviews"),
        col("negative_reviews"),
        Rnd.r(col("likeness_score"), 6).as("likeness_score"),
        Rnd.r(col("normalized_likeness_score"), 6).as("normalized_likeness_score"))
      .orderBy(key)

  def userKpis(spark: SparkSession, sfDir: String): DataFrame =
    finish(Kpis.userKpis(Facts.facts(spark, sfDir)), "id", "average_spent")

  def shopKpis(spark: SparkSession, sfDir: String): DataFrame =
    finish(Kpis.shopKpis(Facts.facts(spark, sfDir), priceCol = "profit"), "shop_id", "average_profit")

  def dateKpis(spark: SparkSession, sfDir: String): DataFrame =
    Kpis.dateKpis(Facts.facts(spark, sfDir))
      .select(col("date"), Rnd.r(col("average_profit_per_day"), 6).as("average_profit_per_day"))
      .orderBy("date")

  /** A4 standalone: global min-max normalize over customer account balance. */
  def minmaxNorm(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_acctbal"))
    MinMax.normalize(c, "c_acctbal", "acctbal_norm")
      .select(col("c_custkey"), col("c_acctbal"), Rnd.r(col("acctbal_norm"), 6).as("acctbal_norm"))
      .orderBy("c_custkey")
  }

  /** P4/P5/P6/P7: conditional + arithmetic derived columns over orders. */
  def conditionalCols(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000.0, lit("high"))
          .when(col("o_totalprice") > 100000.0, lit("mid"))
          .otherwise(lit("low")).as("price_band"),
        (!(col("o_orderstatus") === "F")).as("open_order"),
        Rnd.r(col("o_totalprice") / when(col("o_custkey") % 100 > 0, col("o_custkey") % 100)
          .otherwise(lit(1)), 6).as("price_per_bucket"),
        lit(0.0).as("zero_col"))
      .orderBy("o_orderkey")

  /** TPC-H Q1-shaped pricing summary (A1/A5: fused multi-agg, one shuffle). */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Rnd.r(StableAgg.ssum(col("l_quantity")), 2).as("sum_qty"),
        Rnd.r(StableAgg.ssum(col("l_extendedprice")), 2).as("sum_base_price"),
        Rnd.r(StableAgg.ssum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        Rnd.r(StableAgg.ssum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2)
          .as("sum_charge"),
        Rnd.r(StableAgg.savg(col("l_quantity")), 6).as("avg_qty"),
        Rnd.r(StableAgg.savg(col("l_extendedprice")), 6).as("avg_price"),
        Rnd.r(StableAgg.savg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Star join: facts against the three small dimensions, every dim
    * BROADCAST so the big side never shuffles for a join — the only
    * exchange in the plan is the final aggregation's. This is the
    * canonical 100 TB dim-join shape (a sort-merge join here would
    * shuffle the fact table three times). */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    l.join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("region"), n("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_items"),
        Rnd.r(StableAgg.ssum(l("l_extendedprice") * (lit(1.0) - l("l_discount"))), 2).as("revenue"))
      .orderBy("region", "nation")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_user_kpis" -> userKpis,
    "q_shop_kpis" -> shopKpis,
    "q_date_kpis" -> dateKpis,
    "q_minmax_norm" -> minmaxNorm,
    "q_conditional" -> conditionalCols,
    "q1_agg" -> q1Agg,
    "q_region_revenue" -> regionRevenue)

  val oracles: Map[String, String] = Map(
    "q_user_kpis" ->
      s"""WITH facts AS (${Facts.factsSql}),
         |agg AS (SELECT id, ${StableAgg.savgSql("price")} AS avg_raw,
         |  CAST(SUM(CASE WHEN sentiment THEN 1 ELSE 0 END) AS BIGINT) AS positive_reviews,
         |  CAST(SUM(CASE WHEN NOT sentiment THEN 1 ELSE 0 END) AS BIGINT) AS negative_reviews
         |  FROM facts GROUP BY id),
         |${kpiTail("id", "average_spent")}""".stripMargin,
    "q_shop_kpis" ->
      s"""WITH facts AS (${Facts.factsSql}),
         |agg AS (SELECT shop_id, ${StableAgg.savgSql("profit")} AS avg_raw,
         |  CAST(SUM(CASE WHEN sentiment THEN 1 ELSE 0 END) AS BIGINT) AS positive_reviews,
         |  CAST(SUM(CASE WHEN NOT sentiment THEN 1 ELSE 0 END) AS BIGINT) AS negative_reviews
         |  FROM facts GROUP BY shop_id),
         |${kpiTail("shop_id", "average_profit")}""".stripMargin,
    "q_date_kpis" ->
      s"""WITH facts AS (${Facts.factsSql})
         |SELECT date, ${Rnd.sql(StableAgg.savgSql("price"), 6)} AS average_profit_per_day
         |FROM facts GROUP BY date ORDER BY date""".stripMargin,
    "q_minmax_norm" ->
      s"""WITH mm AS (SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer)
         |SELECT c_custkey, c_acctbal,
         |  ${Rnd.sql("CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END", 6)} AS acctbal_norm
         |FROM customer, mm ORDER BY c_custkey""".stripMargin,
    "q_conditional" ->
      s"""SELECT o_orderkey,
         |  CASE WHEN o_totalprice > 200000.0 THEN 'high'
         |       WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS price_band,
         |  NOT (o_orderstatus = 'F') AS open_order,
         |  ${Rnd.sql("o_totalprice / (CASE WHEN o_custkey % 100 > 0 THEN o_custkey % 100 ELSE 1 END)", 6)}
         |    AS price_per_bucket,
         |  0.0 AS zero_col
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Rnd.sql(StableAgg.ssumSql("l_quantity"), 2)} AS sum_qty,
         |  ${Rnd.sql(StableAgg.ssumSql("l_extendedprice"), 2)} AS sum_base_price,
         |  ${Rnd.sql(StableAgg.ssumSql("l_extendedprice * (1.0 - l_discount)"), 2)} AS sum_disc_price,
         |  ${Rnd.sql(StableAgg.ssumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"), 2)} AS sum_charge,
         |  ${Rnd.sql(StableAgg.savgSql("l_quantity"), 6)} AS avg_qty,
         |  ${Rnd.sql(StableAgg.savgSql("l_extendedprice"), 6)} AS avg_price,
         |  ${Rnd.sql(StableAgg.savgSql("l_discount"), 6)} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_region_revenue" ->
      s"""SELECT r.r_name AS region, n.n_name AS nation,
         |  COUNT(*) AS n_items,
         |  ${Rnd.sql(StableAgg.ssumSql("l.l_extendedprice * (1.0 - l.l_discount)"), 2)} AS revenue
         |FROM lineitem l
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY r.r_name, n.n_name ORDER BY region, nation""".stripMargin)
}
