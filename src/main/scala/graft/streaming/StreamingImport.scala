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

  /** Current version directory of a maintained target, if any. Only
    * COMMITTED versions count: a directory without the parquet writer's
    * `_SUCCESS` marker is a torn write from a crashed attempt and must be
    * invisible to readers — the replay of that batch overwrites it. This
    * is what makes at-least-once foreachBatch delivery yield an
    * exactly-once published state. Listed through the Hadoop FileSystem
    * resolved FROM THE PATH (not the default FS): the target lives on
    * cluster storage, where a `java.io.File` listing silently returns
    * nothing and every batch would re-create the target from scratch. */
  def currentVersion(spark: SparkSession, targetRoot: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(targetRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).toSeq
        .filter { st =>
          val n = st.getPath.getName.stripPrefix("v")
          st.isDirectory && st.getPath.getName.startsWith("v") &&
          n.nonEmpty && n.forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
        }
        .map(_.getPath.getName.stripPrefix("v").toLong)
      if (versions.isEmpty) None else Some(s"$targetRoot/v${versions.max}")
    }
  }

  /** Reads the maintained target state (empty-schema DF if none yet). */
  def readTarget(spark: SparkSession, targetRoot: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentVersion(spark, targetRoot) match {
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
        applyBatch(batch, batchId, mapping, targetRoot, targetSchema,
          mode, nonNullable)
      }
      .start()
  }

  /** One micro-batch merge — the foreachBatch body, exposed so replay
    * semantics are testable. IDEMPOTENT under at-least-once delivery:
    * a re-run of batch N reads the last COMMITTED version (a torn vN has
    * no `_SUCCESS` and is ignored; a committed vN was produced from the
    * same input and target, and re-merging identical source rows leaves
    * every merged value unchanged). The output is written to a hidden
    * temp dir and published with an atomic rename — never an in-place
    * overwrite of a directory the merge may be reading. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      mapping: Mapping,
      targetRoot: String,
      targetSchema: org.apache.spark.sql.types.StructType,
      mode: ImportMode = CreateAndUpdate,
      nonNullable: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val target = readTarget(spark, targetRoot, targetSchema)
    val projected = mapping.project(batch)
    val merged = Upsert(target, projected, mapping, mode, nonNullable)
      .merged
    val tmp = s"$targetRoot/.tmp-v$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    // FS resolved from the destination path, NOT FileSystem.get(conf):
    // with targetRoot on a non-default filesystem (s3a:// under an HDFS
    // default) the default FS throws "Wrong FS" on rename/delete.
    // NOTE: the publish protocol relies on rename atomicity, which HDFS
    // and ABFS provide but raw S3 does not — on S3, point targetRoot at
    // an S3Guard/consistent layer or use a manifest commit (see
    // ManifestTable) instead of directory renames.
    val dst = new org.apache.hadoop.fs.Path(s"$targetRoot/v$batchId")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true) // torn or superseded attempt, readers ignore it
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new java.io.IOException(s"failed to publish $dst")
    ()
  }
}
