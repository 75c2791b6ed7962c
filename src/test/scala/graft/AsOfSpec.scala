package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right row at or before left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:00:00"), 50.0)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:03:00"), "t1"), // latest quote: 100.0
      (1L, ts("2024-01-01 10:05:00"), "t2"), // tie → inclusive: 101.0
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote → null
      (3L, ts("2024-01-01 10:00:00"), "t4")  // no key match → null
    ).toDF("k", "tts", "trade")

    val got = AsOf.join(trades, quotes, "k", "k", "tts", "qts",
      Seq("price")).orderBy("trade").collect().toSeq
    assert(got == Seq(
      Row(1L, ts("2024-01-01 10:03:00"), "t1", 100.0),
      Row(1L, ts("2024-01-01 10:05:00"), "t2", 101.0),
      Row(1L, ts("2024-01-01 09:00:00"), "t3", null),
      Row(3L, ts("2024-01-01 10:00:00"), "t4", null)))
  }

  test("as-of join plan is one shuffle, no range/cartesian join") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("k", "qts", "price")
    val trades = Seq((1L, ts("2024-01-01 10:00:01"), "t"))
      .toDF("k", "tts", "trade")
    val p = AsOf.join(trades, quotes, "k", "k", "tts", "qts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }
}
