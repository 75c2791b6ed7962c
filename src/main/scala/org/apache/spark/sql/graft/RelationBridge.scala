package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` call the manifest table's native scan path
  * needs: turning a hand-built [[LogicalPlan]] (a `LogicalRelation` over
  * a manifest-backed `HadoopFsRelation`) into a public [[DataFrame]].
  * `Dataset.ofRows` is public bytecode with `private[sql]` Scala
  * visibility, so the shim lives under the sql package — the same
  * packaging pattern (and the same call) Delta Lake uses to expose its
  * log-backed relations. Keep this file to exactly this.
  */
object RelationBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
