package graft.queries

import graft.Tables
import graft.functions.Prompts
import graft.operators.{DenseId, PoolAssign}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small relational operators from SURVEY.md §2 that are not part of the
  * KPI or enrichment families: dense row indexing (P2), limits (P9/O2),
  * JSON encode/decode (F6), prompt folding (F1), pool assignment (J4/F4/
  * F5). Each has a DuckDB mirror.
  */
object RelationalQueries extends QueryModule {

  /** P2 — dense 1-based item_id over lineitem's unique four-column key
    * (`extractor.go:107-113`), via the distributed sort + zipWithIndex
    * operator (no single-partition window). */
  def itemIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    DenseId.withDenseId(
      Tables.lineitem(spark, sfDir).select(keys.map(col): _*),
      keys.map(col), "item_id")
      .orderBy("item_id")
  }

  /** J4/F4/F5 — collector key decoration: every order row draws a user
    * from the customer pool and a shop from the supplier pool by
    * seeded-permutation modulo (seeds 42 / 24 as in the reference). */
  def poolAssign(spark: SparkSession, sfDir: String): DataFrame = {
    val records = DenseId.withDenseId(
      Tables.orders(spark, sfDir).select("o_orderkey"), Seq(col("o_orderkey")), "row_idx")
    val users = PoolAssign.assign(records, col("row_idx"),
      Tables.customer(spark, sfDir), "c_custkey", "user_key", a = 7919L, b = 42L)
    PoolAssign.assign(users, col("row_idx"),
      Tables.supplier(spark, sfDir), "s_suppkey", "shop_key", a = 104729L, b = 24L)
      .select("row_idx", "o_orderkey", "user_key", "shop_key")
      .orderBy("row_idx")
  }

  /** F1 — batch prompt fold over the documents, batches of 25. */
  def promptFold(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.documents(spark, sfDir)
      .select((col("doc_id") + 1).as("item_id"), col("text"))
    Prompts.fold(items, col("item_id"),
      format_string("id : %d , review : %s", col("item_id"), col("text")), 25)
      .orderBy("batch_id")
  }

  /** F6 — to_json/from_json round-trip: any loss or format drift breaks
    * the oracle compare against the raw columns. */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    Tables.orders(spark, sfDir)
      .select(to_json(struct(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))).as("j"))
      .select(from_json(col("j"), schema).as("p"))
      .select(col("p.o_orderkey"), col("p.o_orderstatus"), col("p.o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** P9/O2 — top-N: orderBy+limit compiles to TakeOrderedAndProject
    * (per-partition heap + driver merge of N rows — no global sort). */
  def limitTopN(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("o_orderkey", "o_totalprice")

  /** HLL distinct-count rollup — the sketch path for cardinalities at
    * 100 TB (fixed-size state, one pass, mergeable partials; exact
    * distinct would shuffle every key). No DuckDB oracle: sketch
    * estimates are engine-specific, so the driver records a rows-only
    * check; the accuracy contract is asserted in RelationalSpec. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")

  /** The HLL sketch's ERROR BOUND on the hash-exact oracle gate
    * (q_approx_distinct_bound — VERDICT r14 item 1): the raw estimates
    * above stay engine-specific (rows-only), but their published
    * guarantee is checkable — ONE plan computes the sketch AND the
    * exact distinct counts per group and emits a within-bound flag at
    * 3× the configured rsd (rsd IS the estimator's relative standard
    * error — Heule et al. 2013; 3σ on deterministic data is a hard
    * engine-quality gate, and this corpus measures well inside 1σ).
    * The DuckDB oracle recomputes the exact side and expects every
    * flag true — so a drifted HLL implementation, a wrong rsd wiring,
    * or a broken merge path all fail the hash compare. The comparison
    * is integer-exact: |approx − exact|·10⁴ ≤ 600·exact. */
  def approxDistinctBound(spark: SparkSession, sfDir: String): DataFrame = {
    def within(approx: Column, exact: Column): Column =
      (abs(approx - exact) * 10000 <= lit(600) * exact).cast("int")
    // one leg per key column, each over the PRE-DISTINCTED (group, key)
    // pairs: two distinct columns in ONE aggregate would plan as the
    // Expand operator (every input row duplicated per distinct column —
    // measured 4.6 s at sf0.1 vs 1.3 s for this shape), while the
    // pre-distinct is an ordinary two-level aggregate with map-side
    // partials. The sketch is computed over the SAME distinct set (HLL
    // register updates are duplicate-idempotent), so the estimate — and
    // the oracle-checked bound — is unchanged.
    def leg(key: String, exactName: String, withinName: String): DataFrame =
      Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col(key)).distinct()
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as(exactName),
          approx_count_distinct(col(key), 0.02).as("__a"))
        .select(col("l_returnflag"), col(exactName),
          within(col("__a"), col(exactName)).as(withinName))
    leg("l_orderkey", "exact_orders", "within_orders")
      .join(leg("l_partkey", "exact_parts", "within_parts"), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        col("within_orders"), col("within_parts"))
      .orderBy("l_returnflag")
  }

  /** Pivot — the wide KPI matrix shape (yearly revenue with one column
    * per order status). Pivot values are DECLARED, not discovered: with
    * explicit values the plan is a single conditional-aggregation hash
    * aggregate — no extra distinct-scan job to find the columns, and a
    * static schema (what you want at scale; `pivot(col)` without values
    * runs a driver-side distinct first). */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .groupBy("yr")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(Rnd.r(graft.operators.StableAgg.ssum(col("o_totalprice")), 2))
      .select(col("yr"), col("F").as("rev_f"), col("O").as("rev_o"), col("P").as("rev_p"))
      .orderBy("yr")

  /** Per-group top-k via the native bounded-state aggregate
    * (`top_k_by`, a TypedImperativeAggregate): top-3 customers by spend
    * within each order priority. With 5 groups and many customers, the
    * window spelling would sort every customer of a priority in ONE
    * task; the aggregate keeps k entries per partial buffer, so map-side
    * combine ships 3 rows per partition per group. */
  def topkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    graft.GraftFunctions.ensure(spark)
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(graft.operators.StableAgg.ssum(col("o_totalprice")).as("total"))
    spend.groupBy("o_orderpriority")
      .agg(call_function("top_k_by", col("total"), col("o_custkey"), lit(3)).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
        col("col.payload").as("o_custkey"), Rnd.r(col("col.score"), 2).as("total_spent"))
      .orderBy("o_orderpriority", "rank")
  }

  /** Salted two-phase aggregation over the (skew-prone) supplier key;
    * the oracle runs the UNSALTED aggregate — results must hash-match,
    * proving the technique semantics-preserving. */
  def saltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Salt.saltedSumCountAvg(
      Tables.lineitem(spark, sfDir), col("l_suppkey"), col("l_extendedprice"))
      .select(col("key").as("l_suppkey"), col("n_rows"),
        Rnd.r(col("total"), 2).as("total"), Rnd.r(col("mean"), 6).as("mean"))
      .orderBy("l_suppkey")

  /** Pre-planned salted JOIN over the skew-prone event→customer edge
    * (one hot user's events would otherwise funnel into a single join
    * task): events are salted per row, the customer dim is replicated
    * per salt, the join runs on (key, salt). The oracle runs the plain
    * UNSALTED join + aggregate — hash-match proves row-for-row identity.
    * Complementary to AQE skew splitting, which cannot act inside
    * streaming micro-batches or pre-spread a downstream keyed stage. */
  def skewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    graft.operators.Salt.saltedJoin(events, cust, "user_id", salts = 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        Rnd.r(graft.operators.StableAgg.ssum(col("value")), 2).as("total_value"))
      .orderBy("c_nationkey")
  }

  /** Morton (Z-order) clustering key over the two query-predicate
    * dimensions of orders — customer and order day. Sorting the table by
    * this ONE key clusters it in BOTH dimensions at once, so per-file
    * parquet min/max statistics skip files for predicates on either
    * (Sinks.writeZOrdered is the write path; ZOrderSpec measures the
    * per-file footprint shrink). The oracle recomputes the identical
    * bit-interleave in SQL — the curve arithmetic is value-checked
    * cross-engine, not spot-tested. */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        graft.functions.ZOrder.interleave(
          col("o_custkey"),
          datediff(col("o_orderdate"), lit("1970-01-01"))).as("zkey"))
      .orderBy("o_orderkey")

  /** CUBE — every grouping-set combination of (status, year) in ONE
    * pass: like rollup/pivot this compiles to a single expand + hash
    * aggregate (each input row fans to its 4 grouping sets map-side,
    * partials combine before the one exchange) — no per-combination
    * re-scan. Null group keys from the expansion are disambiguated with
    * sentinels, the rollup pattern. */
  def cubeStatusYear(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .cube(col("o_orderstatus"), col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        Rnd.r(graft.operators.StableAgg.ssum(col("o_totalprice")), 2).as("revenue"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("yr"), lit(-1L)).as("yr"),
        col("n_orders"), col("revenue"))
      .orderBy("status", "yr")

  /** Window-analytics surface on one partitioned pass: lag/lead,
    * row_number, ntile and percent_rank over each customer's order
    * history — every function shares ONE window spec, so Catalyst plans
    * a single per-customer sort (parallel across customers, bounded by
    * the largest history; never a whole-frame window). percent_rank is
    * (rank-1)/(n-1) — an exact IEEE division of integers, portable
    * without rounding. Edge nulls from lag/lead are sentineled to keep
    * the oracle's float compare null-free. */
  def windowFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)))
      .withColumn("next_price", coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0)))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr", percent_rank().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        col("prev_price"), col("next_price"), col("quartile"), col("pr"))
      .orderBy("o_custkey", "rn")
  }

  /** VALUE-based (RANGE) window frames: per order, the customer's
    * rolling 30-day order count and spend — the time-decayed feature /
    * trailing-metric shape that row frames (q_window_funcs) cannot
    * express when a customer's order days are irregular. The frame is
    * `RANGE BETWEEN 29 PRECEDING AND CURRENT ROW` over integer
    * day-since-epoch, so same-day orders are PEERS (both engines
    * include the full peer group — that exact boundary semantics is
    * what the oracle pins). One per-customer exchange, each partition
    * sorts independently; the spend rides [[graft.operators.StableAgg]]
    * decimals so the rolling sum is partition-order-independent. */
  def rollingRange(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("day")).rangeBetween(-29, 0)
    Tables.orders(spark, sfDir)
      // pre-cast the decimal here: with both frame aggregates in ONE
      // select over an already-typed input they fuse onto a single
      // WindowExec (a Project between two withColumn windows blocks
      // CollapseWindow and doubles the per-partition frame pass)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(30,8)").as("__price"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        count(lit(1)).over(w).as("roll_n"),
        sum(col("__price")).over(w).cast("double").as("roll_spend"))
      .orderBy("o_orderkey")
  }

  /** Set-operator surface: customers active in BOTH 1995 and 1996
    * (INTERSECT) vs only in 1995 (EXCEPT), tagged and unioned. Spark
    * plans both as aggregate + shuffle-or-broadcast semi/anti joins on
    * the key — set semantics without materializing either side
    * distinct-first. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    def active(yr: Int) = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === yr).select(col("o_custkey"))
    active(1995).intersect(active(1996)).withColumn("tag", lit("both"))
      .unionByName(active(1995).except(active(1996)).withColumn("tag", lit("only_1995")))
      .orderBy("tag", "o_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cube" -> cubeStatusYear,
    "q_window_funcs" -> windowFuncs,
    "q_rolling_range" -> rollingRange,
    "q_set_ops" -> setOps,
    "q_item_index" -> itemIndex,
    "q_pool_assign" -> poolAssign,
    "q_prompt_fold" -> promptFold,
    "q_json_roundtrip" -> jsonRoundtrip,
    "q_limit_topn" -> limitTopN,
    "q_approx_distinct" -> approxDistinct,
    "q_approx_distinct_bound" -> approxDistinctBound,
    "q_pivot" -> pivotStatus,
    "q_topk_per_group" -> topkPerGroup,
    "q_salted_agg" -> saltedAgg,
    "q_skew_join" -> skewJoin,
    "q_zorder_key" -> zorderKey)

  val oracles: Map[String, String] = Map(
    // the oracle recomputes the exact distinct counts and expects the
    // engine's within-3σ flags to be uniformly true — the sketch's
    // guarantee, not its engine-specific estimate, is what is hashed
    "q_approx_distinct_bound" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(1 AS INTEGER) AS within_orders,
        |  CAST(1 AS INTEGER) AS within_parts
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_zorder_key" ->
      // the CTE keeps interleaveSql's short-reference contract: the
      // substituted snippet is textually duplicated 32x by the
      // doubling rounds, so feed it column names, not expressions
      s"""WITH o AS (SELECT o_orderkey, o_custkey,
         |  datediff('day', DATE '1970-01-01', o_orderdate) AS d FROM orders)
         |SELECT o_orderkey,
         |  ${graft.functions.ZOrder.interleaveSql("o_custkey", "d")} AS zkey
         |FROM o ORDER BY o_orderkey""".stripMargin,
    "q_skew_join" ->
      s"""SELECT c.c_nationkey, COUNT(*) AS n_events,
         |  ${Rnd.sql(graft.operators.StableAgg.ssumSql("e.value"), 2)} AS total_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cube" ->
      s"""SELECT COALESCE(o_orderstatus, '(all)') AS status,
         |  COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS yr,
         |  COUNT(*) AS n_orders,
         |  ${Rnd.sql(graft.operators.StableAgg.ssumSql("o_totalprice"), 2)} AS revenue
         |FROM orders GROUP BY CUBE(o_orderstatus, CAST(year(o_orderdate) AS BIGINT))
         |ORDER BY status, yr""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  COALESCE(lag(o_totalprice, 1) OVER w, -1.0) AS prev_price,
        |  COALESCE(lead(o_totalprice, 1) OVER w, -1.0) AS next_price,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    // decimal accumulation inside the frame (StableAgg rule): the sum
    // is exact, so ONE final cast to double matches bit-for-bit
    "q_rolling_range" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice,
        |    datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE) AS roll_spend
        |FROM t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_set_ops" ->
      """WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT o_custkey, 'both' AS tag
        |FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' AS tag
        |FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_item_index" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber) AS item_id
        |FROM lineitem ORDER BY item_id""".stripMargin,
    "q_pool_assign" ->
      """WITH r AS (SELECT o_orderkey, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_idx FROM orders),
        |cu AS (SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) - 1 AS pool_idx FROM customer),
        |su AS (SELECT s_suppkey, ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS pool_idx FROM supplier)
        |SELECT r.row_idx, r.o_orderkey, cu.c_custkey AS user_key, su.s_suppkey AS shop_key
        |FROM r
        |JOIN cu ON cu.pool_idx =
        |  (((r.row_idx - 1) % (SELECT COUNT(*) FROM customer)) * 7919 + 42) % (SELECT COUNT(*) FROM customer)
        |JOIN su ON su.pool_idx =
        |  (((r.row_idx - 1) % (SELECT COUNT(*) FROM supplier)) * 104729 + 24) % (SELECT COUNT(*) FROM supplier)
        |ORDER BY row_idx""".stripMargin,
    "q_prompt_fold" ->
      """SELECT CAST(FLOOR(doc_id / 25.0) AS BIGINT) AS batch_id,
        |  STRING_AGG('id : ' || CAST(doc_id + 1 AS VARCHAR) || ' , review : ' || text,
        |             chr(10) ORDER BY doc_id) AS prompt
        |FROM documents GROUP BY 1 ORDER BY batch_id""".stripMargin,
    "q_json_roundtrip" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey",
    "q_limit_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_pivot" -> {
      def rev(s: String) = Rnd.sql(graft.operators.StableAgg.ssumSql(
        s"CASE WHEN o_orderstatus = '$s' THEN o_totalprice END"), 2)
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |  ${rev("F")} AS rev_f, ${rev("O")} AS rev_o, ${rev("P")} AS rev_p
         |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin
    },
    "q_topk_per_group" ->
      s"""WITH s AS (SELECT o_orderpriority, o_custkey,
         |    ${graft.operators.StableAgg.ssumSql("o_totalprice")} AS total
         |  FROM orders GROUP BY 1, 2),
         |r AS (SELECT o_orderpriority, o_custkey, total,
         |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
         |      ORDER BY total DESC, o_custkey) AS rank
         |  FROM s)
         |SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank, o_custkey,
         |  ${Rnd.sql("total", 2)} AS total_spent
         |FROM r WHERE rank <= 3
         |ORDER BY o_orderpriority, rank""".stripMargin,
    "q_salted_agg" ->
      s"""SELECT l_suppkey, COUNT(*) AS n_rows,
         |  ${Rnd.sql(graft.operators.StableAgg.ssumSql("l_extendedprice"), 2)} AS total,
         |  ${Rnd.sql(graft.operators.StableAgg.savgSql("l_extendedprice"), 6)} AS mean
         |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)
}
