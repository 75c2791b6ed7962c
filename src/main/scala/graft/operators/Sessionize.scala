package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream table (user_id, ts, ...).
  *
  * A session break occurs when the gap to the previous event of the same
  * user exceeds `gapMinutes`. One shuffle (window by user_id); the
  * cumulative-sum-of-breaks trick assigns session indexes in the same pass.
  */
object Sessionize {

  def apply(
      events: DataFrame,
      gapMinutes: Int = 30,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: Option[String] = Some("event_id")): DataFrame = {
    // Deterministic tiebreak for same-timestamp events when an id column
    // exists (None → order by timestamp alone).
    val order = col(tsCol) +:
      idCol.filter(events.columns.contains).map(col).toSeq
    val byUser = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(byUser)
    val isBreak = when(
      prev.isNull ||
        col(tsCol).cast("long") - prev.cast("long") > gapMinutes * 60L, 1L)
      .otherwise(0L)
    events
      .withColumn("_break", isBreak)
      .withColumn("session_idx",
        sum(col("_break")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_break")
  }

  /** Per-session rollup: event count, bounds, duration seconds. */
  def summarize(
      events: DataFrame,
      gapMinutes: Int = 30): DataFrame =
    apply(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
          .as("duration_s"))
}
