package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.mapping.Mapping
import graft.operators.{CreateAndUpdate, ImportMode, Upsert}

/** Continuous import: applies the key-matched upsert to every micro-batch
  * of a CSV-shaped source stream, maintaining the target as parquet.
  *
  * Each batch runs the same single-join merge as the batch
  * [[graft.operators.Upsert]] against the current target state and
  * atomically replaces it (write to a new versioned directory, repoint) —
  * the lakehouse pattern without a table-format dependency; swap the sink
  * for MERGE INTO on Delta/Iceberg in production deployments.
  */
object StreamingImport {

  /** Current version directory of a maintained target, if any. */
  def currentVersion(targetRoot: String): Option[String] = {
    val root = new java.io.File(targetRoot)
    Option(root.listFiles())
      .map(_.filter(f => f.isDirectory && f.getName.startsWith("v"))
        .map(_.getName.stripPrefix("v").toLong))
      .filter(_.nonEmpty)
      .map(vs => s"$targetRoot/v${vs.max}")
  }

  /** Reads the maintained target state (empty-schema DF if none yet). */
  def readTarget(spark: SparkSession, targetRoot: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentVersion(targetRoot) match {
      case Some(dir) => spark.read.schema(schema).parquet(dir)
      case None => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }

  /** Starts the continuous import. `rawStream` must be a streaming
    * DataFrame shaped like a [[graft.sources.Sources]] output
    * (`_raw` array<string> + `_line`). */
  def start(
      rawStream: DataFrame,
      mapping: Mapping,
      targetRoot: String,
      targetSchema: org.apache.spark.sql.types.StructType,
      checkpoint: String,
      mode: ImportMode = CreateAndUpdate,
      nonNullable: Seq[String] = Nil): StreamingQuery = {
    mapping.complete(targetSchema)
    rawStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val target = readTarget(spark, targetRoot, targetSchema)
        val projected = mapping.project(batch)
        val merged = Upsert(target, projected, mapping, mode, nonNullable)
          .merged
        val next = s"$targetRoot/v$batchId"
        merged.write.mode("overwrite").parquet(next)
        ()
      }
      .start()
  }
}
