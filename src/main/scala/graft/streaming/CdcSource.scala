package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.store.ManifestTable

/** Structured Streaming SOURCE over a [[ManifestTable]]'s change feed —
  * `spark.readStream.format("graft-cdc")` turns the table's CDC diff into
  * a first-class stream: offsets are manifest VERSIONS (checkpointed by
  * the engine like any Kafka offset), each micro-batch is exactly
  * `ManifestTable.changes(from, to)` for its offset range, and a
  * restarted query resumes from its checkpoint without re-emitting or
  * skipping a commit. This is the push-based complement to the polling
  * followers (`IncrementalAgg.refresh` / `MaterializedView.refresh`): a
  * `foreachBatch` body that merges into a derived ManifestTable gets
  * end-to-end exactly-once from the derived table's replay ledger, and
  * any other sink gets standard at-least-once with deterministic replay
  * (a batch re-runs with the SAME offset range, and the feed over
  * immutable snapshots is deterministic).
  *
  * The v1 `Source` API is the right shape here (the same choice Delta
  * Lake's streaming source makes): `getBatch` returns the change-feed
  * DataFrame — a join-shaped plan over the touched buckets of each
  * commit — directly, so the stream's per-batch cost is the feed's
  * (∝ data the commits touched, never the table), and no partition-level
  * reader has to re-implement the reconcile/diff logic.
  *
  * Options (case-insensitive):
  *  - `root` (required): the table root.
  *  - `startingVersion`: `latest` (default — only commits made after the
  *    stream first starts), `earliest` (the full history, including the
  *    creation commit's inserts), or a version N ≥ 0 (changes made by
  *    commit N and later). Like Delta's option of the same name, `latest`
  *    is resolved when the source is first created; a checkpointed
  *    restart resumes from the checkpoint, not from a re-resolution.
  *  - `key`: key column override — only needed for pre-format-4 tables
  *    whose manifests don't record their key column.
  *  - `maxVersionsPerBatch`: admission control — cap how many table
  *    commits one micro-batch may span (default unbounded). A stream
  *    catching up after downtime processes the backlog in bounded bites
  *    instead of one giant batch.
  *
  * The stream schema must be supplied via `.schema(tableSchema)` (the
  * TABLE's columns — the source appends `_change_type` and `_version`).
  * Snapshot retention is the operational contract: the feed for versions
  * (from, to] needs manifests from..to retained, so `vacuum(keepLast)`
  * must keep at least the stream's maximum lag; a stream that falls
  * behind a vacuum fails loudly on the missing manifest rather than
  * silently skipping commits.
  */
final class CdcSource(
    spark: SparkSession,
    metadataPath: String,
    tableSchema: StructType,
    root: String,
    keyOverride: Option[String],
    startingVersion: Option[String],
    maxVersionsPerBatch: Option[Int]) extends Source {

  import CdcSource._

  override val schema: StructType = outputSchema(tableSchema)

  /** The version the stream starts AFTER — the first batch covers
    * (initialFrom, end]. Resolved ONCE per checkpoint and pinned in the
    * source's metadata dir: `latest` against the table at first start
    * (missing table → -1, so a table created later streams from its
    * creation commit); a RESTART reads the pinned value instead of
    * re-resolving (a re-resolved `latest` would sit above the
    * checkpoint and make getOffset hide the downtime backlog). The pin
    * doubles as the restart detector for admission control. */
  private val (initialFrom: Long, isRestart: Boolean) = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "graft-cdc-start")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        // A torn pin (crash mid-write) re-resolves — the fresh-start path.
        text.toLongOption
      }
    pinned match {
      case Some(v) => (v, true)
      case None =>
        val v = startingVersion.map(_.toLowerCase) match {
          case None | Some("latest") =>
            ManifestTable.currentVersion(spark, root).getOrElse(-1L)
          case Some("earliest") => -1L
          case Some(s) =>
            val n = s.toLongOption.getOrElse(throw new IllegalArgumentException(
              s"startingVersion must be 'latest', 'earliest' or a version " +
                s"number, got '$s'"))
            require(n >= 0L, s"startingVersion $n < 0 (use 'earliest' for " +
              "the full history)")
            n - 1L
        }
        val out = fs.create(p, true)
        try out.write(v.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        (v, false)
    }
  }

  /** Highest offset the engine has asked for or committed. Admission
    * control paces from it, but only once it reflects real engine state:
    * on a fresh checkpoint that is `initialFrom` immediately; on a
    * RESTART the truth lives in the checkpoint we cannot read, so pacing
    * waits for the engine to re-establish it through getBatch/commit —
    * until then getOffset reports the table's real head (pacing
    * suppressed), because offering anything lower risks offering LESS
    * than the checkpointed offset and stalling the stream forever. */
  private var lastEnd: Long = initialFrom
  private var engineSynced: Boolean = !isRestart

  private def offsetValue(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[OffsetV1] = {
    val cur = ManifestTable.currentVersion(spark, root).getOrElse(-1L)
    val end = maxVersionsPerBatch match {
      case Some(n) if engineSynced => math.max(math.min(cur, lastEnd + n), lastEnd)
      case _ => math.max(cur, lastEnd)
    }
    if (end > initialFrom) Some(LongOffset(end)) else None
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(offsetValue).getOrElse(initialFrom)
    val to = offsetValue(end)
    lastEnd = math.max(lastEnd, to)
    engineSynced = true
    // Key column: manifests (format 4+) record it; the override exists
    // for older tables. Resolved per batch, not at construction — the
    // table may not exist yet when the stream starts.
    val key = keyOverride
      .orElse(ManifestTable.currentManifest(spark, root)
        .map(_.keyColumn).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        s"table at $root records no key column (pre-format-4 manifest?) " +
          "— pass the 'key' option"))
    val batch = ManifestTable.changes(spark, root, tableSchema, key, from, to)
      .select(schema.fieldNames.map(col).toSeq: _*)
    // The engine asserts isStreaming on v1 batches; re-root the feed's
    // physical plan as a streaming frame with the declared schema (the
    // classic-API bridge Delta's source uses for the same purpose).
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(spark, batch, schema)
  }

  override def commit(end: OffsetV1): Unit = {
    lastEnd = math.max(lastEnd, offsetValue(end))
    engineSynced = true
  }

  override def stop(): Unit = ()

  override def toString: String = s"CdcSource[$root]"
}

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

/** Registers `graft-cdc` (via META-INF/services) and builds [[CdcSource]]
  * from reader options. */
final class CdcSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  /** User schema, else the table's manifest-recorded one (format 7
    * self-describing tables). Fixed at stream definition like any
    * streaming schema: columns a later evolution adds don't appear until
    * the stream is redefined (older-schema reads of newer files are a
    * plain projection). */
  private def tableSchemaOf(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: Option[StructType]): StructType =
    schema
      .orElse(normalized(parameters).get("root").flatMap(root =>
        ManifestTable.recordedSchema(sqlContext.sparkSession, root)))
      .getOrElse(throw new IllegalArgumentException(
        "graft-cdc requires the TABLE schema via .schema(...) (or a " +
          "format-7 table whose manifest records it) — the source " +
          s"appends ${CdcSource.ChangeTypeCol} and ${CdcSource.VersionCol}"))

  private def normalized(parameters: Map[String, String]): Map[String, String] =
    parameters.map { case (k, v) => k.toLowerCase -> v }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      CdcSource.outputSchema(tableSchemaOf(sqlContext, parameters, schema)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val p = normalized(parameters)
    val root = p.getOrElse("root",
      throw new IllegalArgumentException("graft-cdc requires option 'root'"))
    val maxVersions = p.get("maxversionsperbatch").map { v =>
      val n = v.toInt
      require(n > 0, s"maxVersionsPerBatch must be > 0, got $n")
      n
    }
    new CdcSource(sqlContext.sparkSession, metadataPath,
      tableSchemaOf(sqlContext, parameters, schema), root, p.get("key"),
      p.get("startingversion"), maxVersions)
  }
}
