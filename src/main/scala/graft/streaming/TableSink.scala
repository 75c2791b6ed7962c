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
  *  - `deleteWhen`: a SQL boolean over the stream's columns marking
  *    DELETE rows (e.g. `_change_type = 'delete'` on a CDC stream
  *    that kept the column) — matching rows erase their keys, the rest
  *    upsert, so a delete-propagating follower needs no foreachBatch.
  *    Both commits replay under the ledger (distinct stream ids), so a
  *    crash between them retries into the same end state. Delete keys
  *    cross the driver (the delete API's probe shape) — bounded by the
  *    batch's delete rate, the same boundedness argument as the
  *    derived-table refresh paths.
  *  - `versionColumn`: net each key to its LAST action in the batch by
  *    this column before applying anything — a micro-batch spanning
  *    delete@v5 + reinsert@v6 (or update@v5 + delete@v6) lands on the
  *    end-of-window truth, whichever order the rows arrived. Filter
  *    `update_preimage` rows upstream when netting a CDC stream: a
  *    preimage ties its postimage's version and the tie-break is
  *    arbitrary. Without this option rows apply as upserts-then-deletes
  *    (delete wins ties) — fine when the transform already nets.
  *  - `dropColumns`: comma-separated columns dropped AFTER
  *    netting/deleteWhen evaluate, BEFORE the merge — so CDC plumbing
  *    (`_change_type`, `_version`) can steer the sink without ending up
  *    in the target table.
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
    deleteWhen: Option[String],
    versionColumn: Option[String],
    dropColumns: Seq[String],
    checkpoint: Option[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val spark = data.sparkSession
    val streamSchema = data.schema
    require(streamSchema.fieldNames.contains(key),
      s"stream schema ${streamSchema.fieldNames.mkString("[", ", ", "]")} " +
        s"has no key column '$key' (set the 'key' option)")
    require(!dropColumns.contains(key),
      s"dropColumns must not drop the key column '$key'")
    versionColumn.foreach(vc =>
      require(streamSchema.fieldNames.contains(vc),
        s"versionColumn '$vc' is not in the stream schema"))
    // v1 sink frames ride the engine's incremental execution — re-root
    // as a plain batch before handing to the merge's multi-pass plan.
    val batch = org.apache.spark.sql.graft.StreamingBridge
      .asBatch(spark, data, streamSchema)
    // Net to each key's LAST action before anything applies — one
    // max_by aggregate over the batch, no Window.
    val netted = versionColumn.fold(batch) { vc =>
      val cols = streamSchema.fieldNames.toSeq
      batch.groupBy(col(key).as("__graft_net_k"))
        .agg(max_by(struct(cols.map(col): _*), col(vc))
          .as("__graft_net_s"))
        .select(cols.map(c => col(s"__graft_net_s.`$c`").as(c)): _*)
    }
    val del = deleteWhen.map(expr)
    val tableSchema = org.apache.spark.sql.types.StructType(
      streamSchema.fields.filterNot(f => dropColumns.contains(f.name)))
    val m = new Mapping(keyColumnName = key)
    tableSchema.fieldNames.foreach(n => m.auto(n))
    m.complete(tableSchema)
    val streamId = checkpoint
      .map(c => StreamingImport.checkpointIdentity(spark, c))
      .getOrElse(root)
    val upserts = del.foldLeft(netted)((df, d) =>
        df.filter(!coalesce(d, lit(false))))
      .drop(dropColumns: _*)
    ManifestTable.merge(upserts, batchId, m, root, tableSchema,
      TableSink.this.mode,
      numBuckets = numBuckets, streamId = streamId, delta = delta)
    del.foreach { d =>
      // After the merge: with netting each key carries ONE action so
      // order is moot; without it, delete wins a mixed batch. Keys cross
      // the driver — the delete API's probe shape, bounded by the
      // batch's delete rate. Distinct ledger stream id: the merge
      // already recorded batchId under streamId, and a shared id would
      // read the delete as replayed.
      val keys = netted.filter(coalesce(d, lit(false)))
        .filter(col(key).isNotNull)
        .select(key).distinct().collect().map(_.get(0)).toSeq
      if (keys.nonEmpty)
        ManifestTable.delete(spark, root, tableSchema, key, keys,
          token = batchId, tokenStream = Some(s"$streamId#delete"))
    }
    if (delta && compactEvery > 0 && batchId > 0 &&
        batchId % compactEvery == 0) {
      val token = (streamId.hashCode.toLong << 32) | (batchId & 0xffffffffL)
      ManifestTable.compact(spark, root, tableSchema, key, token)
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
      deleteWhen = p.get("deletewhen"),
      versionColumn = p.get("versioncolumn"),
      dropColumns = p.get("dropcolumns")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil),
      checkpoint = p.get("checkpointlocation"))
  }
}
