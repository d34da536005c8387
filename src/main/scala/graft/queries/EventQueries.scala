package graft.queries

import graft.Tables
import graft.operators.StableAgg
import graft.streaming.EventWindows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Windowed event KPIs, batch form — the SAME aggregation the streaming
  * variant runs (EventWindows.dailyKpis), so the DuckDB oracle checks
  * the arithmetic of the streaming plan. Also exercises F6 (declared-
  * schema from_json on the props column).
  */
object EventQueries extends QueryModule {

  def eventWindow(spark: SparkSession, sfDir: String): DataFrame =
    EventWindows.dailyKpis(Tables.events(spark, sfDir))
      .select(col("day"), col("event_type"), col("n_events"),
        Rnd.r(col("total_value"), 2).as("total_value"), col("sum_k"))
      .orderBy("day", "event_type")

  /** Sessionization: per-user sessions split on a 30-minute inactivity
    * gap, via lag + running sum windows PARTITIONED BY user — bounded
    * per-key state, fully parallel (never a whole-frame window). The
    * streaming analog is flatMapGroupsWithState; this is the batch
    * formulation over event time in exact integer micros. */
  def eventSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        Rnd.r(StableAgg.ssum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_no")
  }

  /** Native `session_window` sessionization — the SAME aggregation the
    * streaming variant runs (EventWindows.sessionKpis), oracled against
    * the first-principles lag+cumsum SQL spelling. The two definitions
    * agree iff the gap-close rule matches exactly: Spark MERGES an
    * event landing exactly AT the gap boundary (`diff > gap` splits,
    * `==` joins — verified empirically, pinned in EventStreamSpec), so
    * the green row pins Spark's native session semantics, batch and
    * streaming both. */
  def sessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    EventWindows.sessionKpis(Tables.events(spark, sfDir))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), Rnd.r(col("raw_total"), 2).as("total_value"))
      .orderBy("user_id", "start_us")

  /** Rollup: revenue totals at (flag, status), per-flag, and grand-total
    * grain in ONE pass (partial-aggregated, no extra scans); grouping
    * nulls are coalesced to '(all)' in both engines. */
  def eventRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        Rnd.r(StableAgg.ssum(col("l_extendedprice")), 2).as("revenue"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n_rows"), col("revenue"))
      .orderBy("returnflag", "linestatus")

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click AT/after it, the first purchase
    * at/after THAT click — strictly sequential steps, the e-commerce
    * behavioral query. Spelled as three CHAINED min-over-partition
    * windows on one user_id spec: t2's predicate reads the t1 column
    * the previous window produced, so the sequential dependency
    * resolves in one pass — ONE events scan and ONE exchange (the
    * staged aggregate-join chain reads the events table once per step;
    * at event-log scale the scans dominate, so the window spelling
    * wins even though it buffers a user's history in the window
    * frame — same state class as q_event_sessions). Exact integer
    * micros; `>=` at each step boundary, pinned by the oracle. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("us") >= col("t1"), col("us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("us") >= col("t2"), col("us"))).over(w))
      .groupBy("user_id")
      // the step times are per-user constants by construction (each is
      // an unbounded-frame window value); min is just a picker
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
      .filter(col("t1").isNotNull) // funnel entry requires a view
      .select(
        col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .otherwise(1L).as("reached"),
        col("t1"),
        coalesce(col("t2"), lit(-1L)).as("t2"),
        coalesce(col("t3"), lit(-1L)).as("t3"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_window" -> eventWindow,
    "q_event_sessions" -> eventSessions,
    "q_session_window" -> sessionWindow,
    "q_funnel" -> funnel,
    "q_rollup" -> eventRollup)

  val oracles: Map[String, String] = Map(
    "q_event_window" ->
      s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
         |  COUNT(*) AS n_events,
         |  ${Rnd.sql(StableAgg.ssumSql("value"), 2)} AS total_value,
         |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q_event_sessions" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |f AS (SELECT user_id, ts, value,
         |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > ${30L * 60 * 1000000} THEN 1 ELSE 0 END AS new_sess,
         |    event_id
         |  FROM e),
         |s AS (SELECT user_id, ts, value,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
         |  FROM f)
         |SELECT user_id, session_no,
         |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  COUNT(*) AS n_events,
         |  ${Rnd.sql(StableAgg.ssumSql("value"), 2)} AS total_value
         |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin,
    "q_session_window" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM events),
         |f AS (SELECT user_id, ts, value, event_id,
         |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > ${30L * 60 * 1000000}
         |      THEN 1 ELSE 0 END AS new_sess
         |  FROM e),
         |s AS (SELECT user_id, ts, value,
         |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
         |  FROM f)
         |SELECT user_id, MIN(epoch_us(ts)) AS start_us,
         |  MAX(epoch_us(ts)) + ${30L * 60 * 1000000} AS end_us,
         |  COUNT(*) AS n_events,
         |  ${Rnd.sql(StableAgg.ssumSql("value"), 2)} AS total_value
         |FROM s GROUP BY user_id, session_no
         |ORDER BY user_id, start_us""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us >= t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us >= t2 GROUP BY 1)
        |SELECT user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |       WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS reached,
        |  t1, COALESCE(t2, -1) AS t2, COALESCE(t3, -1) AS t3
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_rollup" ->
      s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
         |  COALESCE(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n_rows,
         |  ${Rnd.sql(StableAgg.ssumSql("l_extendedprice"), 2)} AS revenue
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin)
}
