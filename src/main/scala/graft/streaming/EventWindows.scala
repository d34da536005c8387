package graft.streaming

import graft.operators.StableAgg
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** T3 (event-time form) — tumbling daily KPIs over the events stream,
  * plus a mapGroupsWithState example for custom per-key state.
  *
  * The reference's "per-day aggregation" groups a STRING date column in
  * batch (`data_transformer.py:140-143`); the streaming extension is
  * event-time `window(ts, '1 day')` + a watermark bounding state. Both
  * forms share this one aggregation so batch results (oracled by DuckDB)
  * verify the streaming plan's arithmetic.
  *
  * Scale: windowed hash agg with partial aggregation; watermark caps
  * state at (#days in flight × #types). The props JSON is parsed with a
  * declared schema (F6) — no inference, codegen'd path.
  */
object EventWindows {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  /** Shared daily-KPI aggregation; works on a batch frame or a stream
    * (with the watermark applied by the caller for streams). */
  def dailyKpis(events: DataFrame): DataFrame =
    events
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        StableAgg.ssum(col("value")).as("total_value"),
        sum(col("k")).cast("long").as("sum_k"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n_events"), col("total_value"), col("sum_k"))

  /** Streaming variant: 1-day watermark, append mode — a window emits
    * once the watermark passes its end; later-than-watermark events are
    * dropped (late-data contract). */
  def streamingDailyKpis(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame =
    dailyKpis(events.withWatermark("ts", watermarkDelay))

  /** Native SESSION windows (gap-close semantics): per-user activity
    * bursts via `session_window(ts, gap)` — Spark merges events whose
    * [ts, ts+gap] intervals TOUCH, so a session spans [first event,
    * last event + gap] and an event landing exactly AT the boundary
    * still JOINS the session (strictly more than `gap` of silence
    * closes it — boundary pinned in EventStreamSpec). The same
    * aggregation runs batch (oracled against the first-principles
    * lag+cumsum SQL spelling, q_session_window) and streaming, where
    * the state store merges partial sessions ACROSS micro-batches and
    * the watermark both bounds state and finalizes sessions (append
    * mode emits a session only once it can no longer grow). Session
    * bounds are emitted as epoch MICROSECONDS — exact integers, no
    * timestamp formatting on the compare path. */
  def sessionKpis(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), StableAgg.ssum(col("value")).as("raw_total"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"), col("raw_total"))

  /** Streaming session windows: watermark bounds the session-merge
    * state; append mode emits each session once the watermark passes
    * its (final) end. */
  def streamingSessionKpis(events: DataFrame, gap: String = "30 minutes",
                           delay: String = "1 hour"): DataFrame =
    sessionKpis(events.withWatermark("ts", delay), gap)

  /** Stream-STATIC enrichment join: a streaming fact side against a
    * batch dimension frame — stateless (no watermark required; the
    * static side is re-planned per micro-batch, which is also how a
    * slowly-refreshed dim table picks up changes), and the explicit
    * broadcast keeps every micro-batch shuffle-free on the stream
    * side: the 100 TB/s-stream × small-dim shape. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream-STREAM interval join — the streaming member of the temporal
    * join family (batch analog: [[graft.operators.RangeJoin]]): each
    * anchor row (e.g. a purchase) joins the follow-up rows of the same
    * key landing within `window` after it.
    *
    * Both sides carry a watermark AND the join condition bounds the time
    * range, which is exactly what lets Spark derive a state EVICTION
    * bound for both buffers — an unbounded stream-stream join would hold
    * every row forever. State ≈ (watermark delay + window) of data per
    * side, keyed — the bounded-state shape that survives a long-running
    * stream. Inner join: emits as matches arrive.
    *
    * `anchors` must have columns (a_key, a_ts, ...); `follows`
    * (f_key, f_ts, ...); disjoint otherwise.
    */
  def intervalJoin(
      anchors: DataFrame, follows: DataFrame,
      window: String = "2 hours", delay: String = "1 hour"): DataFrame =
    anchors.withWatermark("a_ts", delay)
      .join(
        follows.withWatermark("f_ts", delay),
        expr(s"a_key = f_key AND f_ts >= a_ts AND f_ts <= a_ts + INTERVAL $window"))

  /** Input / state / output rows for [[customSessionize]]. Session
    * bounds are epoch MICROSECONDS, matching [[sessionKpis]]. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSess(startUs: Long, lastUs: Long, n: Long, total: Double)
  case class SessOut(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, raw_total: Double)

  /** Hand-rolled event-time sessionizer on flatMapGroupsWithState — the
    * escape hatch for session semantics `session_window` can't express
    * (dynamic gaps, per-session caps, custom merge logic). This default
    * configuration reproduces the native contract exactly (verified
    * against [[sessionKpis]] in EventStreamSpec): events whose
    * [ts, ts+gap] intervals TOUCH merge, a session spans
    * [first event, last event + gap], and append-mode emission happens
    * once the watermark reaches the session end.
    *
    * State per key is a list of OPEN sessions (not raw events) — a
    * late-but-in-watermark event may extend or bridge them, so more
    * than one can be in flight; memory is O(open sessions), bounded by
    * the watermark delay, never O(events). Eviction is two-pronged:
    * keys receiving data evict inline against the current watermark;
    * silent keys wake via an event-time timeout pinned to the earliest
    * session close. Both prongs are micro-batch-driven — at 100 TB/day
    * the state store shards by key across executors and this function
    * only ever sees one key's bounded list.
    */
  def customSessionize(events: Dataset[SessEvent],
                       gapUs: Long = 30L * 60 * 1000000L,
                       delay: String = "1 hour"): Dataset[SessOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, rows: Iterator[SessEvent], state: GroupState[List[OpenSess]]) => {
          val incoming = rows.map { e =>
            // getTime truncates to millis; restore the sub-ms micros
            // from getNanos or boundary events land one session off
            // the microsecond-precision native session_window
            val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            OpenSess(us, us, 1L, e.value)
          }.toList
          // Merge point-sessions into gap-separated runs: after sorting
          // by start, a session fuses into the previous one iff its
          // start touches [start, last + gap] (closed boundary — the
          // EventStreamSpec boundary witness applies here too).
          val merged = (state.getOption.getOrElse(Nil) ++ incoming)
            .sortBy(s => (s.startUs, s.lastUs))
            .foldLeft(List.empty[OpenSess]) { (acc, s) =>
              acc match {
                case h :: t if s.startUs <= h.lastUs + gapUs =>
                  OpenSess(h.startUs, math.max(h.lastUs, s.lastUs),
                    h.n + s.n, h.total + s.total) :: t
                case _ => s :: acc
              }
            }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(s => s.lastUs + gapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // wake at the earliest close; the API requires a timestamp
            // strictly beyond the current watermark
            val wakeMs = open.map(s => (s.lastUs + gapUs) / 1000L).min
            state.setTimeoutTimestamp(math.max(wakeMs, state.getCurrentWatermarkMs() + 1))
          }
          closed.map(s => SessOut(user, s.startUs, s.lastUs + gapUs, s.n, s.total)).iterator
        })
  }

  /** Custom keyed state via mapGroupsWithState: running event count per
    * user across micro-batches (the KeyValueGroupedDataset state API the
    * collector's accumulation loop would use for per-key state). */
  def runningCountPerUser(events: Dataset[(Long, String)]): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }
  }

  def outputModeAppend: OutputMode = OutputMode.Append()
}
