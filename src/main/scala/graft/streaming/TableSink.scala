package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.mapping.Mapping
import graft.operators.{Create, CreateAndUpdate, ImportMode, Update}
import graft.store.ManifestTable

/** Structured Streaming SINK into a [[ManifestTable]] —
  * `df.writeStream.format("graft-table")` makes the manifest table a
  * first-class streaming target: every micro-batch runs the incremental
  * key-matched MERGE (write cost ∝ the batch's touched buckets, never
  * the table), exactly-once through the table's replay ledger keyed by
  * (checkpoint incarnation, batchId) — the same discipline as
  * [[StreamingImport]], which remains the entry point for CSV-shaped
  * raw streams with Mapping parse/policy semantics; this sink is its
  * TYPED complement for frames already in table shape (e.g. a
  * transformed `graft-cdc` stream: readStream → transforms →
  * writeStream, a derived manifest table maintained end-to-end by the
  * engine with no foreachBatch glue).
  *
  * Options (case-insensitive):
  *  - `root` (required): target table root.
  *  - `key` (default `id`): the upsert key column.
  *  - `numBuckets` (default 16): table property, creation only.
  *  - `mode`: `upsert` (default — create + update), `create` (insert
  *    new keys only), `update` (existing keys only).
  *  - `delta`: `true` selects the LSM write path (batch-sized delta
  *    files; readers reconcile).
  *  - `compactEvery`: with delta, fold delta-carrying buckets back to
  *    one file every N batches.
  *
  * OutputMode must be Append or Update (each micro-batch carries rows
  * to upsert); Complete mode re-emits the whole result every batch —
  * that is a rewrite-the-table semantics the merge exists to avoid, so
  * it refuses at stream definition.
  */
final class TableSink(
    root: String,
    key: String,
    mode: ImportMode,
    numBuckets: Int,
    delta: Boolean,
    compactEvery: Int,
    checkpoint: Option[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val schema = data.schema
    require(schema.fieldNames.contains(key),
      s"stream schema ${schema.fieldNames.mkString("[", ", ", "]")} has " +
        s"no key column '$key' (set the 'key' option)")
    // v1 sink frames ride the engine's incremental execution — re-root
    // as a plain batch before handing to the merge's multi-pass plan.
    val batch = org.apache.spark.sql.graft.StreamingBridge
      .asBatch(spark, data, schema)
    val m = new Mapping(keyColumnName = key)
    schema.fieldNames.foreach(n => m.auto(n))
    m.complete(schema)
    val streamId = checkpoint
      .map(c => StreamingImport.checkpointIdentity(spark, c))
      .getOrElse(root)
    ManifestTable.merge(batch, batchId, m, root, schema, mode,
      numBuckets = numBuckets, streamId = streamId, delta = delta)
    if (delta && compactEvery > 0 && batchId > 0 &&
        batchId % compactEvery == 0) {
      val token = (streamId.hashCode.toLong << 32) | (batchId & 0xffffffffL)
      ManifestTable.compact(spark, root, schema, key, token)
    }
  }

  override def toString: String = s"GraftTableSink[$root]"
}

/** Registers `graft-table` (via META-INF/services) and builds
  * [[TableSink]] from writer options. */
final class TableSinkProvider extends StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-table"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Complete(),
      "graft-table sinks upsert each micro-batch incrementally; Complete " +
        "mode re-emits the whole result per batch (a full-table rewrite " +
        "every trigger) — use Append or Update, or materialize a complete " +
        "aggregate through foreachBatch deliberately")
    require(partitionColumns.isEmpty,
      "graft-table lays data out by key-hash buckets (a table property); " +
        "partitionBy is not supported")
    val p = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-table requires option 'root'"))
    val mode = p.getOrElse("mode", "upsert").toLowerCase match {
      case "upsert" => CreateAndUpdate
      case "create" => Create
      case "update" => Update
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' (use upsert, create or update)")
    }
    new TableSink(
      root = root,
      key = p.getOrElse("key", "id"),
      mode = mode,
      numBuckets = p.get("numbuckets").map(_.toInt).getOrElse(16),
      delta = p.get("delta").exists(_.toBoolean),
      compactEvery = p.get("compactevery").map(_.toInt).getOrElse(0),
      checkpoint = p.get("checkpointlocation"))
  }
}
