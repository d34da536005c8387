package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared "e-commerce facts" fixture mapping (FIXTURES.md §2): the
  * harness star schema stands in for the reference's bronze product
  * records — `lineitem ⋈ orders` plays sales facts, `o_custkey` the user
  * `id` pool, `l_suppkey` the `shop_id` pool, `l_extendedprice` the
  * `price`, `l_shipdate` the string `date`.
  *
  * The deterministic sentiment rule stands in for the LLM scorer so the
  * DuckDB oracle can mirror it exactly (SURVEY.md §5.1): boolean from a
  * stable key parity, NULL for every "failed batch" (reference null-fill
  * semantics, `data_transformer.py:100-109`). Both the Column expression
  * and the SQL snippet are generated here so Spark and oracle can never
  * drift.
  */
object Facts {

  /** Spark-side sentiment rule over lineitem columns. */
  def sentiment(orderkey: Column, partkey: Column): Column =
    when(pmod(orderkey, lit(10)) === 9, lit(null).cast("boolean"))
      .otherwise(pmod(partkey, lit(2)) === 0)

  /** The same rule as ANSI SQL for the DuckDB oracle. */
  def sentimentSql(orderkey: String, partkey: String): String =
    s"CASE WHEN $orderkey % 10 = 9 THEN NULL ELSE ($partkey % 2 = 0) END"

  /** facts = lineitem ⋈ orders on the order key, decorated with the
    * sentiment rule. The join is a plain FK equi-join; at scale Catalyst
    * picks shuffled hash / sort-merge on the shared `*_orderkey` — both
    * sides shuffle once on the same key, and AQE handles skew.
    */
  def facts(spark: SparkSession, sfDir: String): DataFrame = {
    // P8 — validate the scan schemas up front (tools.py:97-115): a
    // missing column fails here with the full list, not mid-plan.
    val l = graft.operators.Validate.requireColumns(Tables.lineitem(spark, sfDir),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"))
    val o = graft.operators.Validate.requireColumns(Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        o("o_custkey").as("id"),
        l("l_suppkey").as("shop_id"),
        l("l_extendedprice").as("price"),
        (l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("profit"),
        date_format(l("l_shipdate"), "yyyy-MM-dd").as("date"),
        sentiment(l("l_orderkey"), l("l_partkey")).as("sentiment"))
  }

  /** Facts decorated with a dense 1-based `item_id` (P2) and the raw
    * boolean `signal` the harness scorer echoes — the input frame for the
    * real enrichment operator (§2.9). The sentiment rule here carries NO
    * null injection: failed-batch nulls are produced by the operator
    * itself, keyed on the batch id. Ordered by the four-column unique key
    * of lineitem so the id assignment is total and oracle-mirrorable
    * with ROW_NUMBER().
    */
  def itemFacts(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        o("o_custkey").as("id"),
        l("l_suppkey").as("shop_id"),
        l("l_extendedprice").as("price"),
        (l("l_extendedprice") * (lit(1.0) - l("l_discount"))).as("profit"),
        date_format(l("l_shipdate"), "yyyy-MM-dd").as("date"),
        (pmod(l("l_partkey"), lit(2)) === 0).as("signal"),
        l("l_orderkey"), l("l_partkey"), l("l_suppkey"), l("l_linenumber"))
    graft.operators.DenseId.withDenseId(
      joined,
      Seq(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
      "item_id")
  }

  /** Oracle mirror of [[itemFacts]] (ROW_NUMBER over the same unique key). */
  val itemFactsSql: String =
    s"""SELECT o.o_custkey AS id, l.l_suppkey AS shop_id,
       |  l.l_extendedprice AS price,
       |  l.l_extendedprice * (1.0 - l.l_discount) AS profit,
       |  strftime(l.l_shipdate, '%Y-%m-%d') AS date,
       |  (l.l_partkey % 2 = 0) AS signal,
       |  ROW_NUMBER() OVER (ORDER BY l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber) AS item_id
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin

  /** Oracle mirror of [[facts]]. */
  val factsSql: String =
    s"""SELECT o.o_custkey AS id, l.l_suppkey AS shop_id,
       |  l.l_extendedprice AS price,
       |  l.l_extendedprice * (1.0 - l.l_discount) AS profit,
       |  strftime(l.l_shipdate, '%Y-%m-%d') AS date,
       |  ${sentimentSql("l.l_orderkey", "l.l_partkey")} AS sentiment
       |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin
}
