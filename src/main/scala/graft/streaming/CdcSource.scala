package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.ManifestTable

/** Structured Streaming SOURCE over a [[ManifestTable]]'s change feed —
  * `spark.readStream.format("graft-cdc")` turns the table's CDC diff
  * into a first-class stream: offsets are manifest VERSIONS
  * (checkpointed by the engine like any Kafka offset), each micro-batch
  * is exactly `ManifestTable.changes(from, to)` for its offset range,
  * and a restarted query resumes from its checkpoint without
  * re-emitting or skipping a commit.
  *
  * DSv2 `MicroBatchStream` (round 10 — previously a v1 `Source` whose
  * join-shaped `getBatch` frame needed the `private[sql]`
  * internalCreateDataFrame bridge). The v2 shape is stage-then-serve:
  * the feed for an offset range — a join-shaped plan over the commits'
  * touched buckets, deterministic over immutable snapshots — runs ONCE
  * as a regular batch job at planning time and lands as UnsafeRow blob
  * files under the stream's own checkpoint dir ([[RowBlobStage]]);
  * input partitions are those files and the readers are `pointTo`
  * loops. Cost: one extra materialization of each batch, bounded by
  * the CHANGE rate (never the table — the 100 TB argument is the
  * feed's, unchanged); committed ranges GC their stage. In exchange
  * the engine owns restart semantics natively: `initialOffset` is only
  * consulted on a fresh checkpoint (no hand-rolled pin file), and
  * admission control paces from the engine's own `startOffset` (no
  * restart-sync state machine). Exactly-once is unchanged: a replayed
  * range re-serves its committed stage, or re-stages byte-identical
  * rows from the immutable snapshots.
  *
  * Options (case-insensitive):
  *  - `root` (required): the table root.
  *  - `startingVersion`: `latest` (default — only commits made after
  *    the stream first starts), `earliest` (the full history, including
  *    the creation commit's inserts), or a version N ≥ 0 (changes made
  *    by commit N and later). Resolved once per checkpoint (the engine
  *    persists `initialOffset`); a restart resumes from the checkpoint.
  *  - `key`: key column override — only needed for pre-format-4 tables
  *    whose manifests don't record their key column.
  *  - `maxVersionsPerBatch`: admission control — cap how many table
  *    commits one micro-batch may span (default unbounded). A stream
  *    catching up after downtime processes the backlog in bounded bites
  *    instead of one giant batch.
  *  - `maxRowsPerBatch`: the row-based twin — cap a batch by the sum of
  *    rows its commits ADDED (manifest metadata only, no data reads;
  *    approximate for PACING, never results: delta counts overcount
  *    superseded keys, metadata-only commits pace through free). An
  *    oversized single commit still advances — a commit is the atomic
  *    feed unit. Both caps compose; the tighter one wins.
  *
  * The stream schema is the TABLE's columns (from `.schema(...)` or a
  * format-7 self-describing manifest) plus `_change_type`/`_version`.
  * Snapshot retention is the operational contract: the feed for
  * (from, to] needs manifests from..to retained, so `vacuum(keepLast)`
  * must keep at least the stream's maximum lag; a stream that falls
  * behind a vacuum fails loudly on the missing manifest rather than
  * silently skipping commits. */
object CdcSource {
  val ChangeTypeCol = "_change_type"
  val VersionCol = "_version"

  /** Table schema + the two CDC columns the feed appends. */
  def outputSchema(table: StructType): StructType = {
    require(!table.fieldNames.contains(ChangeTypeCol) &&
      !table.fieldNames.contains(VersionCol),
      s"table schema must not contain $ChangeTypeCol/$VersionCol — the " +
        "source appends them")
    StructType(table.fields ++ Seq(
      StructField(ChangeTypeCol, StringType),
      StructField(VersionCol, LongType)))
  }

  /** Strips the CDC columns when present (a round-tripped output
    * schema), else treats the schema as the TABLE's. */
  private[streaming] def tableSchemaFrom(schema: StructType): StructType = {
    val names = schema.fieldNames
    if (names.length >= 2 && names(names.length - 2) == ChangeTypeCol &&
        names.last == VersionCol)
      StructType(schema.fields.dropRight(2))
    else schema
  }

  /** Scala-side convenience for the DataStreamReader incantation. */
  def readStream(
      spark: SparkSession,
      root: String,
      tableSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format(classOf[CdcSourceProvider].getName)
      .schema(tableSchema)
      .options(options)
      .option("root", root)
      .load()

  /** Schema-inferred variants for self-describing (format 7+) tables. */
  def readStream(spark: SparkSession, root: String): DataFrame =
    readStream(spark, root, Map.empty[String, String])

  def readStream(
      spark: SparkSession,
      root: String,
      options: Map[String, String]): DataFrame =
    spark.readStream
      .format(classOf[CdcSourceProvider].getName)
      .options(options)
      .option("root", root)
      .load()
}

/** Version offset: the manifest version the stream has consumed
  * THROUGH (a batch covers `(start, end]`). */
private[streaming] case class CdcOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[streaming] case class CdcInputPartition(
    path: String, numFields: Int) extends InputPartition

/** Carries the SESSION's Hadoop conf to the executors (credentials /
  * endpoint settings for scheme-qualified checkpoints); the reader's
  * close() covers early-terminated tasks so handles never leak. */
private[streaming] class CdcReaderFactory(
    confW: org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[CdcInputPartition]
    new PartitionReader[InternalRow] {
      private val it =
        RowBlobStage.readUnsafe(cp.path, cp.numFields, confW.value)
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = it.close()
    }
  }
}

private[graft] final class CdcMicroBatchStream(
    spark: SparkSession,
    root: String,
    tableSchema: StructType,
    keyOverride: Option[String],
    startingVersion: Option[String],
    maxVersionsPerBatch: Option[Int],
    checkpointLocation: String,
    upsertsOnly: Boolean = false,
    maxRowsPerBatch: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow, NATIVE (not the engine's compatibility
    * wrapper): the run's end version is FENCED at prepare time, so a
    * commit landing mid-run never extends the current run — it waits
    * for the next catch-up invocation. Admission pacing
    * (maxVersionsPerBatch) still applies within the fence, so a long
    * backlog drains in bounded micro-batches and then terminates. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(head)

  /** `upsertsOnly` is the `readStream.table("graft.db.t")` face: plain
    * TABLE-schema rows (inserts + update postimages), REFUSING ranges
    * that contain deletes — the Delta contract for a plain streaming
    * table read; full CDC (deletes, preimages, `_change_type`) stays on
    * `format("graft-cdc")`. */
  private val outSchema =
    if (upsertsOnly) tableSchema else CdcSource.outputSchema(tableSchema)

  private def head: Long =
    ManifestTable.currentVersion(spark, root).getOrElse(-1L)

  /** Called by the engine ONLY on a fresh checkpoint — persisted in the
    * offset log thereafter, so `latest` pins exactly once by
    * construction (the v1 source needed a hand-written pin file for
    * this). */
  override def initialOffset(): Offset = {
    val v = startingVersion.map(_.toLowerCase) match {
      case None | Some("latest") => head
      case Some("earliest") => -1L
      case Some(s) =>
        // a non-numeric value is a TAG name (the VERSION AS OF
        // contract): the stream starts at the pinned corpus cut —
        // resolved ONCE here, then persisted in the offset log like
        // any other start
        val n = s.toLongOption.getOrElse(
          graft.store.ManifestTable.resolveTag(
            org.apache.spark.sql.SparkSession.active, root, s))
        require(n >= 0L, s"startingVersion $n < 0 (use 'earliest' for " +
          "the full history)")
        n - 1L
    }
    CdcOffset(v)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "paced through SupportsAdmissionControl.latestOffset(start, limit)")

  /** Rows ADDED by commit `v` (file-entry diff vs `v-1`, manifest
    * metadata only) — the row-based admission unit. Approximate for
    * pacing, never for results: delta-file counts overcount superseded
    * keys, metadata-only commits (truncate/restore) count 0 and pace
    * through instantly. Memoized — committed manifests are immutable,
    * and the map stays bounded by the backlog actually walked. */
  private val addedRowsMemo =
    scala.collection.mutable.HashMap.empty[Long, Long]
  private def addedRows(v: Long): Long =
    addedRowsMemo.getOrElseUpdate(v, {
      val cur = ManifestTable.readManifest(spark, root, v)
      val prevPaths: Set[String] =
        if (v == 0) Set.empty
        else ManifestTable.readManifest(spark, root, v - 1)
          .entries.map(_.relPath).toSet
      cur.entries.filterNot(e => prevPaths(e.relPath)).map(_.rows).sum
    })

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[CdcOffset].version
    val h = availableNowCap.getOrElse(head)
    val capV = maxVersionsPerBatch match {
      case Some(n) => math.max(math.min(h, from + n), from)
      case None => math.max(h, from)
    }
    val end = maxRowsPerBatch match {
      case None => capV
      case Some(maxR) =>
        // walk commits forward while the row budget lasts; ALWAYS
        // admit at least one (an oversized commit must still advance
        // — a commit is the atomic feed unit)
        var v = from; var rows = 0L; var stop = false
        while (!stop && v < capV) {
          val nx = addedRows(v + 1)
          if (v == from || rows + nx <= maxR) {
            v += 1; rows += nx
            if (rows >= maxR) stop = true
          } else stop = true
        }
        v
    }
    CdcOffset(end)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    CdcOffset(json.trim.toLong)

  private def stageDir(from: Long, to: Long): String =
    s"$checkpointLocation/graft-cdc-staged/$from-$to"

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[CdcOffset].version
    val to = end.asInstanceOf[CdcOffset].version
    if (to <= from) return Array.empty
    val dir = stageDir(from, to)
    if (!RowBlobStage.isStaged(spark, dir)) {
      // Key column: manifests (format 4+) record it; the override exists
      // for older tables. Resolved per batch, not at construction — the
      // table may not exist yet when the stream starts.
      val key = keyOverride
        .orElse(ManifestTable.currentManifest(spark, root)
          .map(_.keyColumn).filter(_.nonEmpty))
        .getOrElse(throw new IllegalArgumentException(
          s"table at $root records no key column (pre-format-4 " +
            "manifest?) — pass the 'key' option"))
      val feed = ManifestTable.changes(spark, root, tableSchema, key,
        from, to)
      val batch =
        if (!upsertsOnly)
          feed.select(outSchema.fieldNames.map(col).toSeq: _*)
        else {
          // Delete-guard, gated on the MANIFEST diff first: a delete
          // requires a REMOVED entry (delete/truncate/restore rewrite
          // or drop files) OR an ADDED TOMBSTONE entry (the
          // delta-delete path adds key-tombstone files and removes
          // nothing — without this arm, tombstone deletes slipped past
          // the guard and the upserts-only filter silently DROPPED
          // their delete rows instead of refusing). Ranges whose
          // commits only added plain data files — the delta-append
          // steady state — still skip entirely (driver-side metadata,
          // no data pass); only delete-shaped ranges pay the
          // change-rate-bounded existence check.
          val mayDelete = {
            var prev: Option[Set[String]] = None
            ((math.max(from, -1L) + 1L) to to).exists { v =>
              val m = ManifestTable.readManifest(spark, root, v)
              val cur = m.entries.map(_.relPath).toSet
              val prevSet = prev.getOrElse(
                if (v > 0)
                  ManifestTable.readManifest(spark, root, v - 1)
                    .entries.map(_.relPath).toSet
                else Set.empty[String])
              val removed = (prevSet -- cur).nonEmpty
              val addedTomb =
                m.entries.exists(e => e.tomb && !prevSet(e.relPath))
              prev = Some(cur)
              removed || addedTomb
            }
          }
          if (mayDelete) {
            val deletes = feed
              .filter(col(CdcSource.ChangeTypeCol) === "delete").limit(1)
              .count()
            if (deletes > 0) throw new IllegalStateException(
              s"streaming table read of $root hit DELETE rows in " +
                s"versions ($from, $to] — a plain readStream.table sees " +
                "upserts only; stream the full change feed with " +
                "spark.readStream.format(\"graft-cdc\") instead")
          }
          feed.filter(col(CdcSource.ChangeTypeCol).isin(
              "insert", "update_postimage"))
            .select(outSchema.fieldNames.map(col).toSeq: _*)
        }
      RowBlobStage.stage(spark, batch, dir)
    }
    RowBlobStage.stagedFiles(spark, dir)
      .map(p => CdcInputPartition(p, outSchema.size): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(RowBlobStage.confOf(spark))

  /** A committed range's stage is dead weight: the engine replays only
    * ranges ABOVE the commit point after a restart. */
  override def commit(end: Offset): Unit = {
    val committed = end.asInstanceOf[CdcOffset].version
    val base = new org.apache.hadoop.fs.Path(
      s"$checkpointLocation/graft-cdc-staged")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) fs.listStatus(base).foreach { s =>
      // committed dirs are "$from-$to"; torn stages are
      // ".tmp-$from-$to-<uuid8>" (crash between the executor write and
      // the rename) — GC both once their range's `to` is committed.
      // Parse `to` from the LAST dash (`from` may be negative: "-1-5").
      val name = s.getPath.getName
      val core =
        if (name.startsWith(".tmp-")) {
          val body = name.drop(5)
          val cut = body.lastIndexOf('-')
          if (cut > 0) body.substring(0, cut) else body
        } else name
      val cut = core.lastIndexOf('-')
      if (cut > 0 && core.substring(cut + 1).toLongOption
          .exists(_ <= committed))
        fs.delete(s.getPath, true)
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdcMicroBatchStream[$root]"
}

/** The v2 table handle `readStream.format("graft-cdc")` resolves to. */
private[streaming] case class CdcStreamTable(
    root: String,
    tableSchema: StructType,
    keyOverride: Option[String],
    startingVersion: Option[String],
    maxVersionsPerBatch: Option[Int],
    maxRowsPerBatch: Option[Long]) extends Table with SupportsRead {

  override def name(): String = s"graft-cdc.`$root`"
  override def schema(): StructType = CdcSource.outputSchema(tableSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def description(): String = s"graft-cdc $root"
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(SparkSession.active, root, tableSchema,
            keyOverride, startingVersion, maxVersionsPerBatch,
            checkpointLocation, maxRowsPerBatch = maxRowsPerBatch)
      }
    }
}

/** Registers `graft-cdc` (via META-INF/services) as a DSv2
  * [[TableProvider]]. */
final class CdcSourceProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"
  override def supportsExternalMetadata(): Boolean = true

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      "graft-cdc requires option 'root'"))

  /** User schema (the TABLE's columns), else the manifest-recorded one
    * (format 7 self-describing tables). Fixed at stream definition like
    * any streaming schema: columns a later evolution adds don't appear
    * until the stream is redefined. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    val table = ManifestTable.recordedSchema(SparkSession.active, root)
      .getOrElse(throw new IllegalArgumentException(
        "graft-cdc requires the TABLE schema via .schema(...) (or a " +
          "format-7 table whose manifest records it) — the source " +
          s"appends ${CdcSource.ChangeTypeCol} and ${CdcSource.VersionCol}"))
    CdcSource.outputSchema(table)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val maxVersions = Option(options.get("maxversionsperbatch")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxVersionsPerBatch must be > 0, got $n")
      n
    }
    val maxRows = Option(options.get("maxrowsperbatch")).map { v =>
      val n = v.toLong
      require(n > 0, s"maxRowsPerBatch must be > 0, got $n")
      n
    }
    CdcStreamTable(rootOf(options),
      CdcSource.tableSchemaFrom(schema),
      Option(options.get("key")),
      Option(options.get("startingversion")),
      maxVersions, maxRows)
  }
}
