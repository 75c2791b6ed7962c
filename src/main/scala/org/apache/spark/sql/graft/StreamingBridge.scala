package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge the CDC streaming source needs: v1
  * `Source.getBatch` frames must carry `isStreaming = true` (asserted by
  * MicroBatchExecution), and the only way to re-root an arbitrary batch
  * plan as a streaming frame is `SQLContext.internalCreateDataFrame` —
  * public bytecode, `private[sql]` in Scala, so this shim lives under
  * `org.apache.spark.sql` (the same packaging pattern Delta Lake's
  * streaming source uses for the same call). Nothing else in the repo
  * reaches into Spark internals this way; keep it that way.
  */
object StreamingBridge {
  def asStreaming(
      spark: SparkSession,
      batch: DataFrame,
      schema: StructType): DataFrame =
    spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(batch.queryExecution.toRdd, schema,
        isStreaming = true)

  /** The sink-side mirror: a v1 `Sink.addBatch` frame rides the engine's
    * incremental execution and must not be re-planned as a streaming
    * relation by downstream batch operators — re-root its physical rows
    * as a plain batch frame. Rows are defensively copied: `toRdd`
    * iterators may reuse their UnsafeRow buffer, and the merge re-reads
    * the frame across several operators. */
  def asBatch(
      spark: SparkSession,
      data: DataFrame,
      schema: StructType): DataFrame =
    spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
      .internalCreateDataFrame(
        data.queryExecution.toRdd.map(_.copy()), schema,
        isStreaming = false)
}
