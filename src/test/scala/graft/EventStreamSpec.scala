package graft

import graft.streaming.EventWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Event-time streaming semantics on a memory source: append-mode
  * windows close when the watermark passes, too-late events are dropped,
  * and mapGroupsWithState carries per-key state across micro-batches. */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("T3 streaming: watermarked daily windows emit on close and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double, String)]
    val events = in.toDF().toDF("ts", "event_type", "value", "props")
    val q = EventWindows.streamingDailyKpis(events)
      .writeStream.format("memory").queryName("daily_kpis")
      .outputMode(EventWindows.outputModeAppend).start()
    try {
      // day 1 data — window still open, nothing emitted
      in.addData((ts("2024-01-01 10:00:00"), "click", 1.0, """{"k": 5}"""),
        (ts("2024-01-01 11:00:00"), "click", 2.0, """{"k": 7}"""))
      q.processAllAvailable()
      assert(spark.table("daily_kpis").count() == 0)
      // day 3 data pushes the watermark past day 1's window end → emit
      in.addData((ts("2024-01-03 09:00:00"), "view", 3.0, """{"k": 1}"""))
      q.processAllAvailable()
      val rows = spark.table("daily_kpis").collect()
        .map(r => (r.getAs[String]("day"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"), r.getAs[Long]("sum_k")))
      assert(rows.toSet == Set(("2024-01-01", "click", 2L, 3.0, 12L)))
      // a day-1 event arriving after the watermark is dropped
      in.addData((ts("2024-01-01 23:00:00"), "click", 100.0, """{"k": 9}"""))
      q.processAllAvailable()
      assert(spark.table("daily_kpis").collect().length == 1)
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark are dropped across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val deduped = graft.operators.Dedup.streamingDedup(
      in.toDF().toDF("ts", "event_id"), "ts", Seq("event_id"), "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:00:01"), 2L),
        (ts("2024-01-01 10:00:02"), 1L)) // dup in same batch
      q.processAllAvailable()
      in.addData((ts("2024-01-01 10:05:00"), 2L), (ts("2024-01-01 10:05:01"), 3L)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join: follow-ups within the window join, outside don't, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val anchors = MemoryStream[(Long, Timestamp, Long)]
    val follows = MemoryStream[(Long, Timestamp, Long)]
    val joined = EventWindows.intervalJoin(
      anchors.toDF().toDF("a_key", "a_ts", "purchase_id"),
      follows.toDF().toDF("f_key", "f_ts", "click_id"),
      window = "2 hours", delay = "1 hour")
    val q = joined.writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      anchors.addData((10L, ts("2024-01-01 10:00:00"), 100L))
      follows.addData(
        (10L, ts("2024-01-01 10:30:00"), 1L), // in window
        (10L, ts("2024-01-01 13:00:00"), 2L), // past the 2h window
        (20L, ts("2024-01-01 10:30:00"), 3L)) // wrong key
      q.processAllAvailable()
      // a follow-up arriving in a LATER micro-batch still joins (the
      // anchor is buffered in join state until the watermark evicts it)
      follows.addData((10L, ts("2024-01-01 11:00:00"), 4L))
      q.processAllAvailable()
      val got = spark.table("attribution").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
      assert(got == Set((100L, 1L), (100L, 4L)))
    } finally q.stop()
  }

  test("session windows: partial sessions MERGE across micro-batches; a gap of silence closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val sessions = EventWindows.streamingSessionKpis(
      in.toDF().toDF("user_id", "ts", "value"), gap = "30 minutes", delay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // second batch: an event 20 min later must MERGE into the open
      // session (cross-batch state), not start a new one
      in.addData((1L, ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0, "session emitted while still open")
      // 2 hours of silence pushes the watermark past the session end
      in.addData((1L, ts("2024-01-01 12:30:00"), 5.0))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 15:00:00"), 0.0)) // closes session 2
      q.processAllAvailable()
      val got = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"))).toSet
      def us(s: String) = ts(s).getTime * 1000L
      assert(got == Set(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:50:00"), 2L), // merged pair + 30min
        (1L, us("2024-01-01 12:30:00"), us("2024-01-01 13:00:00"), 1L)))
    } finally q.stop()
  }

  test("session windows: an event exactly AT the gap boundary MERGES (batch; pins the oracle's > vs >= rule)") {
    import spark.implicits._
    // Spark's session intervals are closed at the end: [ts, ts+gap]
    // touching merges, so a 30:00.000000 successor joins the session.
    // The q_session_window oracle SQL must therefore split on
    // `diff > gap`, NOT `>= gap` — this pair is the regression witness.
    val boundary = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0), // == gap → same session
      (2L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:30:00.000001"), 2.0) // one μs past → new session
    ).toDF("user_id", "ts", "value")
    val got = EventWindows.sessionKpis(boundary, gap = "30 minutes")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("stream-static join: every micro-batch enriches against the batch dim, shuffle-free") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val enriched = EventWindows.enrichWithDim(
      in.toDF().toDF("user_id", "amount"), dim, Seq("user_id"))
    val q = enriched.writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, 10.0), (3L, 7.0))
      q.processAllAvailable()
      in.addData((2L, 5.0))
      q.processAllAvailable()
      val got = spark.table("enriched_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("amount"),
          Option(r.getAs[String]("tier")))).toSet
      assert(got == Set((1L, 10.0, Some("gold")), (3L, 7.0, None), (2L, 5.0, Some("silver"))))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: merges across batches, emits on watermark, times out silent keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventWindows.SessEvent]
    val sessions = EventWindows.customSessionize(in.toDS(), delay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("custom_sessions")
      .outputMode("append").start()
    try {
      in.addData(EventWindows.SessEvent(1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // cross-batch merge into the open session, not a new one
      in.addData(EventWindows.SessEvent(1L, ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("custom_sessions").count() == 0, "session emitted while still open")
      // silence pushes the watermark past session 1's end; the user-1
      // key gets NO new data here, so only the event-time TIMEOUT can
      // emit it (user 2 carries the watermark forward)
      in.addData(EventWindows.SessEvent(2L, ts("2024-01-01 12:30:00"), 5.0))
      q.processAllAvailable()
      in.addData(EventWindows.SessEvent(2L, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("custom_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("raw_total"))).toSet
      def us(s: String) = ts(s).getTime * 1000L
      assert(got == Set(
        (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:50:00"), 2L, 3.0),
        (2L, us("2024-01-01 12:30:00"), us("2024-01-01 13:00:00"), 1L, 5.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer agrees with native session_window on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // interleaved multi-user events, out of order ACROSS batches (user 3
    // arrives 2.5h behind the batch-1 maximum — inside the 3h delay)
    val batch1 = Seq((1L, "2024-01-01 10:00:00", 1.0), (2L, "2024-01-01 10:05:00", 4.0),
      (1L, "2024-01-01 10:29:00", 2.0), (1L, "2024-01-01 11:30:00", 3.0))
    val batch2 = Seq((2L, "2024-01-01 10:40:00", 1.5), (3L, "2024-01-01 09:00:00", 7.0))
    val all = batch1 ++ batch2
    val in = MemoryStream[EventWindows.SessEvent]
    val sessions = EventWindows.customSessionize(in.toDS(), delay = "3 hours")
    val q = sessions.writeStream.format("memory").queryName("custom_vs_native")
      .outputMode("append").start()
    try {
      in.addData(batch1.map(e => EventWindows.SessEvent(e._1, ts(e._2), e._3)))
      q.processAllAvailable()
      in.addData(batch2.map(e => EventWindows.SessEvent(e._1, ts(e._2), e._3)))
      q.processAllAvailable()
      // far-future sentinel closes every real session via timeout
      in.addData(EventWindows.SessEvent(999L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("custom_vs_native").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("raw_total")))
        .filter(_._1 != 999L).toSet
      val native = EventWindows.sessionKpis(
          all.map(e => (e._1, ts(e._2), e._3)).toDF("user_id", "ts", "value"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("raw_total"))).toSet
      assert(streamed == native)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: microsecond boundary agrees with native session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // B sits 500 MICROSECONDS past A's closed gap boundary: natively a
    // NEW session — a millisecond-truncating sessionizer would merge
    val all = Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-01 10:30:00.0005", 2.0))
    val in = MemoryStream[EventWindows.SessEvent]
    val sessions = EventWindows.customSessionize(in.toDS(), delay = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("micro_boundary")
      .outputMode("append").start()
    try {
      in.addData(all.map(e => EventWindows.SessEvent(e._1, ts(e._2), e._3)))
      q.processAllAvailable()
      in.addData(EventWindows.SessEvent(999L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("micro_boundary").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("raw_total")))
        .filter(_._1 != 999L).toSet
      val native = EventWindows.sessionKpis(
          all.map(e => (e._1, ts(e._2), e._3)).toDF("user_id", "ts", "value"))
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"),
          r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("raw_total"))).toSet
      assert(streamed.size == 2, s"micros truncated: $streamed")
      assert(streamed == native)
    } finally q.stop()
  }

  test("mapGroupsWithState: running per-user counts survive across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = EventWindows.runningCountPerUser(in.toDS())
      .writeStream.format("memory").queryName("running_counts")
      .outputMode("update").start()
    try {
      in.addData((1L, "a"), (1L, "b"), (2L, "c"))
      q.processAllAvailable()
      in.addData((1L, "d"))
      q.processAllAvailable()
      val last = spark.table("running_counts").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // final state: user 1 → 3 events, user 2 → 1
      assert(last.contains((1L, 3L)) && last.contains((2L, 1L)))
    } finally q.stop()
  }
}
