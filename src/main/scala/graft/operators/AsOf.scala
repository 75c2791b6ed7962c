package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the latest right
  * row with the same key and right.ts <= left.ts.
  *
  * Spark-first shape: instead of a range join (O(n·m) per key) or a custom
  * physical operator, both sides are UNIONed and a single window pass per
  * key carries the last-seen right values forward (`last(..., ignoreNulls)`
  * over rows-unbounded-preceding). One shuffle on the key, sorted once —
  * the same cost profile a purpose-built as-of SparkPlan would have.
  *
  * Right rows must be unique per (key, ts) for deterministic results —
  * pre-aggregate the right side if necessary. Ties (right.ts == left.ts)
  * match, mirroring DuckDB/kdb `ASOF JOIN ... ON l.ts >= r.ts`.
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rv = struct(rightValueCols.map(col): _*)
    val rvType = right.select(rv.as("_rv")).schema("_rv").dataType
    val lrow = struct(leftCols.map(col): _*)
    val lrowType = left.select(lrow.as("_lrow")).schema("_lrow").dataType

    val r = right.select(
      col(rightKey).as("_k"),
      col(rightTs).as("_ts"),
      lit(0).as("_side"),
      rv.as("_rv"),
      lit(null).cast(lrowType).as("_lrow"))
    val l = left.select(
      col(leftKey).as("_k"),
      col(leftTs).as("_ts"),
      lit(1).as("_side"),
      lit(null).cast(rvType).as("_rv"),
      lrow.as("_lrow"))

    // _side orders right rows before left rows at equal ts → inclusive tie.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = r.unionByName(l)
      .withColumn("_filled", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col("_lrow").getField(c).as(c)) ++
      rightValueCols.map(c => col("_filled").getField(c).as(c))
    filled.select(out: _*)
  }
}
