package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{
  DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.mapping.Mapping
import graft.operators.{Create, CreateAndUpdate, ImportMode, Update}
import graft.store.ManifestTable

/** Structured Streaming SINK into a [[ManifestTable]] —
  * `df.writeStream.format("graft-table")` makes the manifest table a
  * first-class streaming target: every micro-batch runs the incremental
  * key-matched MERGE (write cost ∝ the batch's touched buckets, never
  * the table), exactly-once through the table's replay ledger keyed by
  * (checkpoint incarnation, epochId).
  *
  * DSv2 `StreamingWrite` (round 10 — previously a v1 `Sink` whose
  * addBatch frame needed the `private[sql]` re-rooting bridge). The v2
  * protocol is the Iceberg shape adapted to a driver-orchestrated
  * commit: executor writers land each partition's rows as UnsafeRow
  * blob files under `<root>/_streamsink/<queryId>/<epoch>`
  * ([[RowBlobStage]]'s codec), their commit messages carry the paths,
  * and the DRIVER's `commit(epochId, ...)` reconstructs the batch as a
  * plain DataFrame (public `createDataFrame` — no internal
  * constructors) and applies the SAME netting/delete/merge/compact
  * pipeline as before, under the ledger. A replayed epoch (restart
  * before the engine logged the commit) re-lands its rows and the
  * ledger no-ops the merge — exactly-once unchanged; committed epochs
  * GC their staging. Cost: one extra materialization per micro-batch,
  * bounded by the batch (the stream's own change rate).
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
  *    batch's delete rate.
  *  - `versionColumn`: net each key to its LAST action in the batch by
  *    this column before applying anything — a micro-batch spanning
  *    delete@v5 + reinsert@v6 lands on the end-of-window truth,
  *    whichever order the rows arrived. Filter `update_preimage` rows
  *    upstream when netting a CDC stream.
  *  - `dropColumns`: comma-separated columns dropped AFTER
  *    netting/deleteWhen evaluate, BEFORE the merge — so CDC plumbing
  *    (`_change_type`, `_version`) can steer the sink without ending
  *    up in the target table.
  *
  * OutputMode must be Append or Update. Complete mode calls the write
  * builder's `truncate()`, which this sink deliberately does not
  * implement — re-emitting the whole result per batch is the
  * full-table rewrite the merge exists to avoid — so the engine
  * refuses at stream start. */
object TableSink {

  private[graft] case class Opts(
      root: String,
      key: String,
      mode: ImportMode,
      numBuckets: Int,
      delta: Boolean,
      compactEvery: Int,
      deleteWhen: Option[String],
      versionColumn: Option[String],
      dropColumns: Seq[String],
      checkpoint: Option[String],
      maxDriverKeys: Int = 100000)

  private[graft] def parse(p: Map[String, String]): Opts = {
    val mode = p.getOrElse("mode", "upsert").toLowerCase match {
      case "upsert" => CreateAndUpdate
      case "create" => Create
      case "update" => Update
      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' (use upsert, create or update)")
    }
    Opts(
      root = p.getOrElse("root", throw new IllegalArgumentException(
        "graft-table requires option 'root'")),
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
      checkpoint = p.get("checkpointlocation"),
      maxDriverKeys = p.get("maxdriverkeys").map { s =>
        val n =
          try s.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"option 'maxdriverkeys' must be an integer, got '$s'") }
        require(n >= 1,
          s"option 'maxdriverkeys' must be >= 1, got $n")
        n
      }.getOrElse(100000))
  }

  /** One micro-batch against the table: net → split deletes → merge →
    * delete → periodic compact, all under the replay ledger. `data` is
    * a plain batch frame. */
  private[streaming] def applyBatch(
      spark: SparkSession,
      data: DataFrame,
      batchId: Long,
      o: Opts,
      streamId: String): Unit = {
    import org.apache.spark.sql.functions._
    val streamSchema = data.schema
    require(streamSchema.fieldNames.contains(o.key),
      s"stream schema ${streamSchema.fieldNames.mkString("[", ", ", "]")} " +
        s"has no key column '${o.key}' (set the 'key' option)")
    require(!o.dropColumns.contains(o.key),
      s"dropColumns must not drop the key column '${o.key}'")
    o.versionColumn.foreach(vc =>
      require(streamSchema.fieldNames.contains(vc),
        s"versionColumn '$vc' is not in the stream schema"))
    // Net to each key's LAST action before anything applies — one
    // max_by aggregate over the batch, no Window. PERSISTED: the
    // lineage bottoms out in blob-file reads off the checkpoint
    // (parallelize(paths).flatMap(readRows)), and the merge leg, the
    // deleteWhen leg, and the merge's own internal actions each
    // re-ran the full remote read + netting without it.
    val netted = o.versionColumn.fold(data) { vc =>
      val cols = streamSchema.fieldNames.toSeq
      data.groupBy(col(o.key).as("__graft_net_k"))
        .agg(max_by(struct(cols.map(col): _*), col(vc))
          .as("__graft_net_s"))
        .select(cols.map(c => col(s"__graft_net_s.`$c`").as(c)): _*)
    }.persist()
    try {
    val del = o.deleteWhen.map(expr)
    val tableSchema = org.apache.spark.sql.types.StructType(
      streamSchema.fields.filterNot(f => o.dropColumns.contains(f.name)))
    val m = new Mapping(keyColumnName = o.key)
    tableSchema.fieldNames.foreach(n => m.auto(n))
    m.complete(tableSchema)
    val upserts = del.foldLeft(netted)((df, d) =>
        df.filter(!coalesce(d, lit(false))))
      .drop(o.dropColumns: _*)
    ManifestTable.merge(upserts, batchId, m, o.root, tableSchema, o.mode,
      numBuckets = o.numBuckets, streamId = streamId, delta = o.delta)
    del.foreach { d =>
      // After the merge: with netting each key carries ONE action so
      // order is moot; without it, delete wins a mixed batch. Distinct
      // ledger stream id: the merge already recorded batchId under
      // streamId, and a shared id would read the delete as replayed.
      // DRIVER-BOUNDED at any delete rate (the refresh discipline):
      // under `maxDriverKeys` the set collects once and probes the
      // keyed delete; past it — a catch-up batch after downtime with a
      // high delete fraction — [[DerivedTable.deleteChunked]] streams
      // deterministic sorted chunks, so the driver never holds more
      // than one chunk and a crashed multi-chunk delete replays
      // chunk-for-chunk (chunk deletes are idempotent on state).
      val keyFrame = netted.filter(coalesce(d, lit(false)))
        .filter(col(o.key).isNotNull)
        .select(o.key).distinct()
      // a delta-mode (LSM) sink tombstones its deletes too: delete
      // cost tracks deleted keys, and the sink's own compactEvery
      // cadence folds the tombstones with the delta tiers
      graft.store.DerivedTable.deleteChunked(spark, o.root, tableSchema,
        o.key, keyFrame, batchId, s"$streamId#delete", o.maxDriverKeys,
        delta = o.delta)
    }
    if (o.delta && o.compactEvery > 0 && batchId > 0 &&
        batchId % o.compactEvery == 0) {
      val token = (streamId.hashCode.toLong << 32) | (batchId & 0xffffffffL)
      ManifestTable.compact(spark, o.root, tableSchema, o.key, token)
    }
    } finally netted.unpersist()
  }
}

private[streaming] case class SinkCommitMessage(
    path: String, rows: Long) extends WriterCommitMessage

private[streaming] class SinkWriterFactory(
    stagingBase: String, numFields: Int,
    confW: org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration])
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] = {
    val path = new org.apache.hadoop.fs.Path(
      s"$stagingBase/$epochId/part-$partitionId-$taskId")
    new DataWriter[InternalRow] {
      private lazy val out = {
        val fs = path.getFileSystem(confW.value)
        new java.io.DataOutputStream(
          new java.io.BufferedOutputStream(fs.create(path, true), 1 << 16))
      }
      private var rows = 0L
      override def write(r: InternalRow): Unit = {
        val b = r.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.UnsafeRow].getBytes
        out.writeInt(b.length); out.write(b); rows += 1
      }
      override def commit(): WriterCommitMessage = {
        if (rows > 0) { out.writeInt(-1); out.close() }
        SinkCommitMessage(path.toString, rows)
      }
      override def abort(): Unit = {
        if (rows > 0) out.close()
        val fs = path.getFileSystem(confW.value)
        if (fs.exists(path)) fs.delete(path, false)
      }
      override def close(): Unit = ()
    }
  }
}

/** The driver half of the v2 protocol: reconstruct the staged batch,
  * apply it under the ledger, GC committed staging. */
private[graft] final class GraftStreamingWrite(
    o: TableSink.Opts,
    schema: StructType,
    queryId: String) extends StreamingWrite {

  private def stagingBase = s"${o.root}/_streamsink/$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SinkWriterFactory(stagingBase, schema.size,
      RowBlobStage.confOf(SparkSession.active))

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val paths = messages.collect {
      case SinkCommitMessage(p, n) if n > 0 => p
    }.toSeq
    val data =
      if (paths.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
      else {
        val sc = schema
        val confW = RowBlobStage.confOf(spark)
        spark.createDataFrame(
          spark.sparkContext.parallelize(paths, paths.size)
            .flatMap(p => RowBlobStage.readRows(p, sc, confW.value)),
          schema)
      }
    // The engine persists queryId in the checkpoint, so it IS the
    // checkpoint incarnation — the ledger key that makes a replayed
    // epoch a no-op. An explicit checkpointLocation option keeps the
    // v1-compatible identity for streams upgraded in place.
    val streamId = o.checkpoint
      .map(c => StreamingImport.checkpointIdentity(spark, c))
      .getOrElse(s"graft-sink-$queryId")
    TableSink.applyBatch(spark, data, epochId, o, streamId)
    // committed epochs (≤ this one) never replay: GC their staging
    val base = new org.apache.hadoop.fs.Path(stagingBase)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.listStatus(base).foreach { s =>
      if (s.getPath.getName.toLongOption.exists(_ <= epochId))
        fs.delete(s.getPath, true)
    }
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    RowBlobStage.drop(spark, s"$stagingBase/$epochId")
  }
}

/** The v2 table handle `writeStream.format("graft-table")` resolves
  * to: STREAMING_WRITE only (batch writes go through
  * `format("graft")`; reads through `graft_table`/`format("graft")`/
  * the catalog). */
private[streaming] case class GraftSinkTable(
    writeSchema: StructType,
    props: Map[String, String]) extends Table with SupportsWrite {

  override def name(): String =
    s"graft-table.`${props.getOrElse("root", "?")}`"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    import scala.jdk.CollectionConverters._
    val merged = props ++
      info.options.asScala.map { case (k, v) => k.toLowerCase -> v }
    val o = TableSink.parse(merged)
    // Update mode applies as upsert (UpdateAsAppendWriteBuilder — the
    // merge IS update semantics); Complete mode finds no truncate()
    // here and the engine refuses it, deliberately: re-emitting the
    // whole result per batch is the full-table rewrite the
    // incremental merge exists to avoid.
    new WriteBuilder
        with org.apache.spark.sql.graft.UpdateAsAppendWriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new GraftStreamingWrite(o, info.schema(), info.queryId())
      }
    }
  }
}

/** Registers `graft-table` (via META-INF/services) as a DSv2
  * [[TableProvider]]. */
final class TableSinkProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-table is a streaming SINK: its schema is the written " +
        "stream's — use it with writeStream.format(\"graft-table\")")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    import scala.jdk.CollectionConverters._
    require(partitioning.isEmpty,
      "graft-table lays data out by key-hash buckets (a table " +
        "property); partitionBy is not supported")
    val props =
      properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap
    TableSink.parse(props) // misuse (no root, bad mode) refuses at
    GraftSinkTable(schema, props) // definition, not on the stream thread
  }
}
