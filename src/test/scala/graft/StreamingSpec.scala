package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Event, StreamingOps}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed counts with watermark emit finalized windows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps
      .windowedCounts(mem.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:01:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:02:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 10:12:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 10:10 windows
      mem.addData(Event(4, ts("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .selectExpr("window.start", "event_type", "n_events", "sum_value")
        .collect().map(r =>
          (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
            r.getDouble(3))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 10:10:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the horizon") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamingOps
      .intervalJoin(clicks.toDF(), buys.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 0),
        Event(2, ts("2024-01-01 10:30:00"), 7, "click", 0))
      buys.addData(
        Event(100, ts("2024-01-01 10:05:00"), 7, "buy", 0), // 1 within 10m
        Event(101, ts("2024-01-01 10:20:00"), 7, "buy", 0), // outside both
        Event(102, ts("2024-01-01 10:31:00"), 8, "buy", 0)) // other user
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData(Event(3, ts("2024-01-01 12:00:00"), 9, "click", 0))
      buys.addData(Event(103, ts("2024-01-01 12:00:00"), 9, "buy", 0))
      q.processAllAvailable()
      val pairs = spark.table("ij")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 100L)), s"missing attribution: $pairs")
      assert(!pairs.contains((1L, 101L)), s"beyond-horizon pair: $pairs")
      assert(!pairs.exists(p => p._1 == 2L && p._2 == 102L),
        s"cross-user pair leaked: $pairs")
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap and timeout") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionize(mem.toDS(), gapMinutes = 30,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart (one session), then a 2h gap
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:05:00"), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 12:30:00"), 1, "click", 4.0))
      q.processAllAvailable()
      // the in-batch gap closes session 1 immediately
      val afterGap = spark.table("sessions").as[graft.streaming.SessionOut]
        .collect()
      assert(afterGap.exists(s =>
        s.user_id == 1 && s.n_events == 2 && s.sum_value == 3.0 &&
          s.session_start == ts("2024-01-01 10:00:00") &&
          s.session_end == ts("2024-01-01 10:05:00")))

      // push the watermark beyond 12:30 + gap → timeout closes session 2
      mem.addData(Event(9, ts("2024-01-01 15:00:00"), 2, "click", 0.5))
      q.processAllAvailable()
      mem.addData(Event(10, ts("2024-01-01 16:00:00"), 2, "click", 0.5))
      q.processAllAvailable()
      val all = spark.table("sessions").as[graft.streaming.SessionOut]
        .collect()
      assert(all.exists(s => s.user_id == 1 && s.n_events == 1 &&
        s.session_start == ts("2024-01-01 12:30:00")))
    } finally q.stop()
  }

  test("sessionize is safe against events behind the watermark: this " +
      "Spark's operator DROPS them pre-delivery (pinned), and the " +
      "timeout floor guards the delivered-late case regardless") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // 10-minute watermark delay, 5-minute gap: an event ~20 min behind
    // the max seen time is still DELIVERED (flatMapGroupsWithState does
    // not drop late input), but lastMs + gap sits BEFORE the watermark —
    // the unfloored setTimeoutTimestamp threw and killed the query
    val q = StreamingOps.sessionize(mem.toDS(), gapMinutes = 5,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark is now ~09:50; this event's timeout would be 09:45
      mem.addData(Event(2, ts("2024-01-01 09:40:00"), 7, "click", 2.0))
      q.processAllAvailable()
      // the query is ALIVE (no timeout-behind-watermark throw), and
      // this Spark's FlatMapGroupsWithStateExec filtered the late row
      // before delivery — no session for user 7 ever exists. The
      // setTimeoutTimestamp floor in sessionize stays as defense in
      // depth for engines/versions that DO deliver late rows.
      mem.addData(Event(3, ts("2024-01-01 11:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts("2024-01-01 12:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val late = spark.table("sessions_late")
        .as[graft.streaming.SessionOut].collect()
      assert(!late.exists(_.user_id == 7),
        s"this Spark drops late rows pre-delivery; a session for the " +
          s"late user means the semantics changed — re-examine the " +
          s"timeout floor: ${late.mkString(", ")}")
      assert(late.exists(s => s.user_id == 1 && s.n_events == 1 &&
        s.session_start == ts("2024-01-01 10:00:00")),
        "on-time sessions must keep closing normally")
    } finally q.stop()
  }

  test("file-source event stream: parquet feed through windowed counts") {
    val dir = "target/test-tmp/event_feed"
    val ckpt = "target/test-tmp/event_ckpt"
    // fresh dirs: a stale checkpoint would replay a previous run's files
    Seq(dir, ckpt).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    // seed the feed directory with one batch of events
    Seq(
      Event(1, ts("2024-01-01 10:01:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:04:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 12:00:00"), 1, "view", 3.0)
    ).toDF().write.mode("overwrite").parquet(dir)

    val stream = StreamingOps.readEventStream(spark, dir)
    val q = StreamingOps.windowedCounts(stream, "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("file_win")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // append a later file to advance the watermark and close windows
      Seq(Event(4, ts("2024-01-01 14:00:00"), 1, "click", 1.0))
        .toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("file_win")
        .selectExpr("window.start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)))
      assert(rows.contains(("2024-01-01 12:00:00.0", "view", 1L)))
    } finally {
      q.stop()
    }
  }

  test("streaming dedup drops repeated content within the watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupStream(df, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), "same text"),
        (2L, ts("2024-01-01 10:01:00"), "same text"),   // dup, dropped
        (3L, ts("2024-01-01 10:02:00"), "other text"))
      q.processAllAvailable()
      mem.addData((4L, ts("2024-01-01 10:03:00"), "same text")) // still dup
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("stream-static near-dup flags arrivals matching the reference corpus") {
    implicit val sc = spark.sqlContext
    val staticDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog by the river"),
      (200L, "completely unrelated reference text about query planners")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingOps.nearDupAgainst(staticDocs, stream)
      .writeStream.format("memory").queryName("near_dup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog by the river"),
        (2L, "some totally fresh content that matches nothing at all here"))
      q.processAllAvailable()
      val matches = spark.table("near_dup_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(matches.contains((1L, 100L)))
      assert(!matches.exists(_._1 == 2L))
    } finally q.stop()
  }
}
