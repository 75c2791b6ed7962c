package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row for streaming operators (mirrors the batch `events`
  * table schema, minus the free-form props column). */
final case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Open-session accumulator carried in stream state. */
final case class SessionState(
    startMs: Long,
    lastMs: Long,
    nEvents: Long,
    sumValue: Double)

/** A closed session emitted downstream. */
final case class SessionOut(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    sum_value: Double)

/** Structured Streaming operators over the events stream.
  *
  * Scale shape: both operators are keyed state over the `user_id` /
  * window shuffle — the same single-shuffle layout as the batch
  * [[graft.operators.Sessionize]] — with watermarks bounding state size so
  * a 1000-executor cluster holds only open windows/sessions, never history.
  */
object StreamingOps {

  /** File-based event stream (parquet directory feed). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Streaming exact dedup: drops rows whose content hash was already
    * seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` keeps the dedup state BOUNDED — at
    * 100 TB/day the state holds one hash per distinct doc per horizon,
    * never the full history). */
  def dedupStream(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", org.apache.spark.sql.functions.md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-static near-duplicate detection: band the STATIC corpus once
    * (broadcast-friendly index), then stream-static equi-join incoming
    * docs' band hashes against it — each arriving document is checked
    * against the full reference corpus without rescanning it. Emits
    * (doc_id, matched_static_id) candidate pairs; exact-verify downstream
    * if needed. */
  def nearDupAgainst(
      staticDocs: DataFrame,
      streamDocs: DataFrame,
      bands: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val staticIdx = graft.operators.Dedup
      .bandIndex(staticDocs, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "static_id")
    graft.operators.Dedup.bandIndex(streamDocs, bands, rowsPerBand)
      .join(staticIdx, Seq("band", "bh"))
      .select(col("doc_id"), col("static_id"))
  }

  /** Watermarked stream-stream INTERVAL join: pairs each left event with
    * right events for the same user within `[0, horizon]` AFTER it —
    * click→purchase attribution, request→response matching. Both sides
    * carry watermarks and the join condition bounds the time skew, so
    * Spark can size the join state to watermark + horizon and EVICT —
    * the state never holds unbounded history, which is what makes a
    * stream-stream join runnable forever at 100 TB/day. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      horizon: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("left_id"),
        col("ts").as("left_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user_id"),
        col("event_id").as("right_id"), col("ts").as("right_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
      col("right_ts") >= col("left_ts") &&
      col("right_ts") <= col("left_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("left_id"), col("right_id"),
        col("left_ts"), col("right_ts"))
  }

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Streaming sessionization with explicit state:
    * `flatMapGroupsWithState` keyed by user, closing a session when the
    * event gap exceeds `gapMinutes` (emitted immediately) or when the
    * event-time timeout fires after the watermark passes the gap horizon.
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def close(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs),
        s.nEvents, s.sumValue)

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        return out
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastMs <= gapMs =>
            open = Some(SessionState(s.startMs, math.max(s.lastMs, t),
              s.nEvents + 1, s.sumValue + e.value))
          case Some(s) =>
            closed += close(userId, s)
            open = Some(SessionState(t, t, 1L, e.value))
          case None =>
            open = Some(SessionState(t, t, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // floor at the watermark: a timeout timestamp at or before
        // the current watermark makes GroupStateImpl THROW, killing
        // the whole query. THIS Spark's FlatMapGroupsWithStateExec
        // filters late input rows pre-delivery (spec-pinned in
        // StreamingSpec), so the natural timeout always clears the
        // watermark today — the floor is defense in depth for
        // engines/versions that deliver late rows to the state
        // function (the documented arbitrary-stateful-ops caveat).
        state.setTimeoutTimestamp(math.max(
          s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
