package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst [[Expression]]s and the public
  * [[Column]] API. Spark 4 wraps columns in `ColumnNode`s; the conversion
  * helpers live in `org.apache.spark.sql.classic` with `private[sql]`
  * visibility, so this one-file shim is placed under the sql package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test seam: drains the listener bus so specs can assert on job
    * counts deterministically (`listenerBus` is `private[spark]`). */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
