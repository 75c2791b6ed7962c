package graft.store

import java.util.OptionalLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft").load(root)` — the batch-read face of the
  * manifest table, completing the trio with the `graft-cdc` streaming
  * source and the `graft-table` streaming sink. Options:
  *
  *   - `versionAsOf` — time travel to a committed version.
  *
  * The schema comes from the manifest (self-describing format-7+
  * tables; each travelled version shows ITS OWN recorded schema) or
  * from an explicit `.schema(...)`.
  *
  * Mechanically this is the Delta-style V2-to-internal-plan handoff:
  * the provider resolves to a thin [[GraftTable]], and
  * [[GraftReadStrategy]] (injected by [[graft.GraftExtensions]], or
  * added to `spark.experimental.extraStrategies` by
  * `GraftExtensions.register`) swaps the scan relation at PLANNING time
  * for the SAME reconciled/pruned plan `ManifestTable.read` builds —
  * one read path, whichever door a query comes in through. The
  * query's own projects and filters are rebased INTO the swapped
  * subtree and re-optimized, so column pruning, parquet pushdown and
  * GraftFileIndex's manifest-level key pruning all still fire. The
  * scan also reports manifest-derived statistics (bytes, and exact row
  * counts on all-compacted tables), so broadcast decisions see real
  * sizes rather than defaults. */
class GraftTableProvider extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider {

  override def shortName(): String = "graft"
  override def supportsExternalMetadata(): Boolean = true

  /** `df.write.format("graft")` — the BATCH write face (the streaming
    * twin is `writeStream.format("graft-table")`). Options: `key`
    * (default `id`), `numBuckets` (creation only, default 16), `delta`
    * (LSM write path on append), `evolveSchema` (opt-in add-only
    * widening on append), `streamId`/`batchId` (explicit idempotency
    * token for exactly-once callers — by default every save() applies,
    * SQL INSERT semantics). SaveModes: ErrorIfExists/Ignore create;
    * Append runs the incremental key-matched MERGE (cost ∝ touched
    * buckets); Overwrite commits INSERT-OVERWRITE state in one version
    * (old files stay for time travel; cost = the new data only). */
  override def createRelation(
      sqlContextArg: org.apache.spark.sql.SQLContext,
      saveMode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val spark = data.sparkSession
    val jmap = new java.util.HashMap[String, String]()
    parameters.foreach { case (k, v) => jmap.put(k, v) }
    val opts = new CaseInsensitiveStringMap(jmap)
    val root = rootOf(opts)
    val key = Option(opts.get("key")).getOrElse("id")
    val numBuckets = Option(opts.get("numBuckets")).map(_.toInt).getOrElse(16)
    require(data.schema.fieldNames.contains(key),
      s"key column '$key' not in the written schema " +
        s"(${data.schema.fieldNames.mkString(", ")}) — set .option(\"key\", ...)")
    val exists = ManifestTable.currentVersion(spark, root).isDefined
    saveMode match {
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"table exists at $root (SaveMode.ErrorIfExists) — use " +
            "append (merge), overwrite (replace), or ignore")
        ManifestTable.create(data, key, root, numBuckets)
      case SaveMode.Ignore =>
        if (!exists) ManifestTable.create(data, key, root, numBuckets)
      case SaveMode.Overwrite =>
        ManifestTable.replace(data, key, root, numBuckets)
      case SaveMode.Append =>
        if (!exists) ManifestTable.create(data, key, root, numBuckets)
        else {
          val schema = data.schema
          val m = new graft.mapping.Mapping(keyColumnName = key)
          schema.fieldNames.foreach(n => m.auto(n))
          m.complete(schema)
          // Default token = the version this merge will claim: every
          // bare save() applies (SQL INSERT semantics); exactly-once
          // callers pass their own streamId/batchId.
          val streamId = Option(opts.get("streamId"))
            .getOrElse("graft-batch-write")
          val batchId = Option(opts.get("batchId")).map(_.toLong)
            .getOrElse(ManifestTable.currentVersion(spark, root)
              .getOrElse(-1L) + 1L)
          ManifestTable.merge(data, batchId, m, root, schema,
            numBuckets = numBuckets, streamId = streamId,
            delta = opts.getBoolean("delta", false),
            evolveSchema = opts.getBoolean("evolveSchema", false))
        }
    }
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext =
        sqlContextArg
      override def schema: StructType = data.schema
    }
  }

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft reads need a table root: spark.read.format(\"graft\")" +
        ".load(root) or .option(\"path\", root)"))

  private def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map { v =>
      try v.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"versionAsOf must be an integer version, got '$v'")
      }
    }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = rootOf(options)
    versionOf(options) match {
      case Some(v) =>
        val m = ManifestTable.readManifest(spark, root, v)
        if (m.schemaJson.isEmpty) throw new IllegalArgumentException(
          s"manifest m$v at $root records no schema (pre-format-7) — " +
            "pass .schema(...) explicitly")
        org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
          .asInstanceOf[StructType]
      case None =>
        ManifestTable.recordedSchema(spark, root).getOrElse(
          throw new IllegalArgumentException(
            s"table at $root records no schema (pre-format-7, or no " +
              "table) — pass .schema(...) explicitly"))
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    GraftTable(rootOf(options), versionOf(options), schema)
  }
}

/** Thin V2 table handle; the real read plan is substituted by
  * [[GraftReadStrategy]]. Writes bridge through `V1Write` — the
  * manifest commit protocol is driver-orchestrated (OCC manifest swap
  * over a completed bucket write), which is exactly the
  * `InsertableRelation` shape; a distributed V2 commit protocol would
  * re-implement what [[ManifestTable.merge]] already guarantees.
  * INSERT INTO runs the key-matched MERGE (upsert semantics — this is
  * a keyed table); INSERT OVERWRITE replaces the table state in one
  * commit (old versions stay readable for time travel). */
private[store] case class GraftTable(
    root: String,
    versionAsOf: Option[Long],
    tableSchema: StructType) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def name(): String =
    s"graft.`$root`" + versionAsOf.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType = tableSchema

  /** DESCRIBE EXTENDED / SHOW TBLPROPERTIES surface: the manifest's
    * own facts. MEMOIZED per table handle — Spark consults
    * `properties()` repeatedly during planning, and a manifest head
    * read per call put real filesystem I/O on every format-face
    * query's plan path (measured: +0.2 s on a sub-10 ms bucket join).
    * DELIBERATE STALENESS: the memo lives as long as this handle, so a
    * handle cached across commits (a long-lived resolved DataFrame, a
    * catalog-cached table) reports the properties — including
    * `version` — as of when it was resolved. Reads stay correct (the
    * scan re-reads the manifest); only DESCRIBE/SHOW TBLPROPERTIES
    * output can lag, and re-resolving the table refreshes it.
    * Invalidating on head change would re-pay the manifest read per
    * call — exactly the cost the memo removes. */
  @transient private lazy val cachedProperties
      : java.util.Map[String, String] = {
    val out = new java.util.HashMap[String, String]()
    ManifestTable.currentManifest(SparkSession.active, root).foreach { m =>
      out.put("key", m.keyColumn)
      out.put("numBuckets", m.numBuckets.toString)
      out.put("version", m.version.toString)
      out.put("format", m.format.toString)
      if (m.clusterCol.nonEmpty) out.put("clusterBy", m.clusterCol)
      if (m.rangeBounds.nonEmpty) out.put("layout", "range")
      if (m.splits.nonEmpty) {
        // observe the online-split state: how many creation-time
        // buckets have split, and the live leaf count (SHOW
        // TBLPROPERTIES is the operator's first stop)
        out.put("splitNodes", m.splits.size.toString)
        out.put("leafBuckets",
          m.entries.map(_.bucket).distinct.size.toString)
      }
      if (m.entries.exists(ManifestTable.isExt(_)))
        out.put("shallowClone", "true") // some bytes live in the
                                        // source table's tree
      ManifestTable.originOf(SparkSession.active, root).foreach {
        case (srcRoot, srcV) =>
          out.put("cloneOrigin", s"$srcRoot@v$srcV")
      }
      val spark = SparkSession.active
      // registry observability (each is one fs.exists when absent —
      // the memo makes even the declared cases a one-time read)
      val tags = ManifestTable.tagsOf(spark, root)
      if (tags.nonEmpty)
        out.put("tags", tags.toSeq.sortBy(_._1)
          .map { case (n, v) => s"$n=v$v" }.mkString(","))
      val cons = ManifestTable.constraintsOf(spark, root)
      if (cons.nonEmpty)
        out.put("constraints", cons.keys.toSeq.sorted.mkString(","))
      ManifestTable.maintenanceOf(spark, root).foreach { pol =>
        val parts = Seq(
          if (pol.zones.nonEmpty) Some(s"zones=${pol.zones.mkString("+")}") else None,
          if (pol.blooms.nonEmpty) Some(s"blooms=${pol.blooms.mkString("+")}") else None,
          if (pol.reclusterDrift > 0) Some(s"reclusterDrift=${pol.reclusterDrift}") else None,
          if (pol.derived) Some("derived=true") else None,
          if (pol.splitBytes > 0) Some(s"splitBytes=${pol.splitBytes}") else None,
          if (pol.compactFiles > 0) Some(s"compactFiles=${pol.compactFiles}") else None,
          if (pol.vacuumKeep > 0) Some(s"vacuumKeep=${pol.vacuumKeep}") else None,
          if (pol.statsCols.nonEmpty) Some(s"statsCols=${pol.statsCols.mkString("+")}") else None
        ).flatten
        if (parts.nonEmpty) out.put("autoMaintain", parts.mkString(","))
      }
    }
    out.put("location", root)
    out
  }

  override def properties(): java.util.Map[String, String] =
    cachedProperties

  /** `DELETE FROM t WHERE <key predicate>`: served metadata-first —
    * key-equality/IN deletes rewrite only the probe keys' buckets
    * (the [[ManifestTable.delete]] path), an unconditional DELETE is
    * a METADATA-ONLY truncate commit (files stay for time travel).
    * Non-key predicates refuse loudly (`canDeleteWhere` false): a
    * row-level rewrite by arbitrary predicate is a different cost
    * class, and silently scanning 100 TB for a DELETE nobody scoped
    * to the key is the wrong default. */
  private def deleteKeysOf(
      filters: Array[org.apache.spark.sql.sources.Filter],
      key: String): Option[Seq[Any]] = filters.toSeq match {
    case Seq(org.apache.spark.sql.sources.EqualTo(a, v))
        if a == key && v != null =>
      // the null guard matches the EqualNullSafe/In cases: the optimizer
      // normally folds `= NULL` to false pre-pushdown, but if one ever
      // reached here it would hand ManifestTable.delete a null probe key
      Some(Seq(v))
    case Seq(org.apache.spark.sql.sources.EqualNullSafe(a, v))
        if a == key && v != null =>
      Some(Seq(v))
    case Seq(org.apache.spark.sql.sources.In(a, vs)) if a == key =>
      Some(vs.toSeq.filter(_ != null))
    case _ => None
  }

  private def isTruncateAll(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.isEmpty ||
      filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue)

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    versionAsOf.isEmpty && {
      isTruncateAll(filters) ||
        ManifestTable.currentManifest(SparkSession.active, root)
          .map(_.keyColumn).filter(_.nonEmpty)
          .exists(k => deleteKeysOf(filters, k).isDefined)
    }

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(versionAsOf.isEmpty,
      "cannot delete from a time-travelled table snapshot")
    val spark = SparkSession.active
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (isTruncateAll(filters)) {
      ManifestTable.replace(
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          tableSchema),
        m.keyColumn, root, m.numBuckets)
    } else {
      val keys = deleteKeysOf(filters, m.keyColumn).getOrElse(
        throw new UnsupportedOperationException(
          s"graft DELETE supports key-column (= / IN) predicates and " +
            s"unconditional truncation; got ${filters.mkString(", ")}"))
      if (keys.nonEmpty)
        // random token (SQL statements are not engine-retried): a
        // version-derived token would let two CONCURRENT DELETEs
        // collide and the OCC loser silently no-op (see the INSERT
        // path); a dedicated token stream keeps the maintenance
        // `lastDelete` slot for the Scala API's replayable callers.
        // `spark.graft.delete.tombstone` opts the SQL surface into the
        // tombstone-delta path (erasure cost ∝ keys, folded by the
        // next compaction) — a session conf because SQL DELETE has
        // nowhere to carry a per-statement option.
        ManifestTable.delete(spark, root, tableSchema, m.keyColumn,
          keys,
          token = java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(Long.MaxValue),
          tokenStream = Some("graft-sql-delete"),
          delta = spark.conf.getOption("spark.graft.delete.tombstone")
            .exists(_.toBoolean))
    }
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
      // COUNT(*)/MIN/MAX answered from manifest metadata: accepted only
      // as a COMPLETE pushdown — no grouping, every aggregate a bare
      // CountStar or a Min/Max over a top-level column that zone
      // sidecars can answer EXACTLY right now (ZoneSkip.zoneMinMax:
      // all buckets single-seq, every live file covered, kind current)
      // — and only when no filter sits below (this builder pushes no
      // filters, so Spark keeps filtered aggregates off this path by
      // itself). count(col)/countDistinct/sum/avg and every refused
      // shape stay on the ordinary scan, exact by construction.
      import org.apache.spark.sql.connector.expressions.aggregate.{
        Aggregation, CountStar, Max, Min}
      private var pushed: Seq[GraftAggScan.PushedAgg] = Nil
      // the manifest version the min/max answers were computed against;
      // the scan counts at the SAME version so one result row never
      // mixes snapshots (a commit can land between planning and
      // execution)
      private var pinnedVersion: Option[Long] = None

      private def fieldOf(e: org.apache.spark.sql.connector.expressions
          .Expression): Option[String] = e match {
        case f: org.apache.spark.sql.connector.expressions.NamedReference
            if f.fieldNames.length == 1 => Some(f.fieldNames.head)
        case _ => None
      }

      // the engine consults supportCompletePushDown then pushAggregation
      // with the same Aggregation — memoized so the bounded-but-not-free
      // zone-sidecar read happens once per planning
      private var lastAgg: Aggregation = _
      private var lastTranslated: Option[Seq[GraftAggScan.PushedAgg]] = None

      private def translate(agg: Aggregation)
          : Option[Seq[GraftAggScan.PushedAgg]] = {
        if (agg eq lastAgg) return lastTranslated
        val out = translateUncached(agg)
        lastAgg = agg; lastTranslated = out
        out
      }

      private def translateUncached(agg: Aggregation)
          : Option[Seq[GraftAggScan.PushedAgg]] = {
        if (agg.groupByExpressions.nonEmpty ||
            agg.aggregateExpressions.isEmpty) return None
        // one zone consultation per distinct min/max column, not per
        // aggregate — the sidecar read is bounded but not free
        lazy val spark = SparkSession.active
        lazy val m = versionAsOf match {
          case Some(v) =>
            Some(ManifestTable.readManifest(spark, root, v))
          case None => ManifestTable.currentManifest(spark, root)
        }
        pinnedVersion = m.map(_.version)
        val memo = scala.collection.mutable.HashMap
          .empty[String, Option[(Option[String], Option[String])]]
        def minMax(c: String) = memo.getOrElseUpdate(c,
          if (!tableSchema.fieldNames.contains(c)) None
          else m.flatMap(mf => ZoneSkip.zoneMinMax(spark, root, mf, c,
            tableSchema(c).dataType)))
        val out = agg.aggregateExpressions.toSeq.map {
          case _: CountStar => Some(GraftAggScan.PushedCount)
          case mn: Min => fieldOf(mn.column).flatMap(c =>
            minMax(c).map(mm => GraftAggScan.PushedMin(c, mm._1)))
          case mx: Max => fieldOf(mx.column).flatMap(c =>
            minMax(c).map(mm => GraftAggScan.PushedMax(c, mm._2)))
          case _ => None
        }
        if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
      }

      override def supportCompletePushDown(agg: Aggregation): Boolean =
        translate(agg).isDefined

      override def pushAggregation(agg: Aggregation): Boolean =
        translate(agg) match {
          case Some(p) => pushed = p; true
          case None => false
        }

      override def build(): Scan =
        if (pushed.nonEmpty)
          GraftAggScan(root, versionAsOf.orElse(pinnedVersion),
            tableSchema, pushed)
        else GraftBatchScan(root, versionAsOf, tableSchema,
          Option(options.get("startingVersion")),
          Option(options.get("maxVersionsPerBatch")).map(_.toInt))
    }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(versionAsOf.isEmpty,
      "cannot write to a time-travelled table snapshot")
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite
        with org.apache.spark.sql.graft.UpdateAsAppendWriteBuilder {
      private var overwrite = false
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        // unpartitioned table: the only overwrite Spark plans is the
        // full one (deleteExpr = true)
        require(filters.isEmpty || filters.forall(
            _ == org.apache.spark.sql.sources.AlwaysTrue),
          s"graft tables only support full INSERT OVERWRITE, got " +
            filters.mkString(", "))
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          /** `df.writeStream.toTable("graft.db.t")`: each micro-batch
            * runs the key-matched MERGE (key + layout from the
            * manifest), exactly-once under the ledger keyed by the
            * query id — the DSv2 streaming protocol shared with
            * `format("graft-table")`. */
          override def toStreaming: org.apache.spark.sql.connector
              .write.streaming.StreamingWrite = {
            require(!overwrite,
              "streaming INSERT OVERWRITE is not supported — stream " +
                "upserts (append/update mode) or batch-overwrite")
            val spark = SparkSession.active
            val m = ManifestTable.currentManifest(spark, root)
              .getOrElse(throw new IllegalStateException(
                s"no manifest table at $root"))
            import scala.jdk.CollectionConverters._
            val opts = Map("root" -> root, "key" -> m.keyColumn,
                "numbuckets" -> m.numBuckets.toString) ++
              info.options.asScala.map { case (k, v) =>
                k.toLowerCase -> v }
            new graft.streaming.GraftStreamingWrite(
              graft.streaming.TableSink.parse(opts), info.schema(),
              info.queryId())
          }
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
              val spark = data.sparkSession
              val m = ManifestTable.currentManifest(spark, root)
                .getOrElse(throw new IllegalStateException(
                  s"no manifest table at $root"))
              val key = m.keyColumn
              require(key.nonEmpty && data.schema.fieldNames.contains(key),
                s"table records key '$key', absent from the insert")
              if (overwrite)
                ManifestTable.replace(data, key, root, m.numBuckets)
              else {
                val mp = new graft.mapping.Mapping(keyColumnName = key)
                data.schema.fieldNames.foreach(n => mp.auto(n))
                mp.complete(data.schema)
                // every INSERT applies (SQL semantics — statements are
                // not engine-retried): a RANDOM batch token under one
                // stream id. A version-derived token would make two
                // CONCURRENT INSERTs collide — the OCC loser re-reads,
                // sees its own token already committed by the winner,
                // and silently no-ops, losing its rows. The ledger
                // keeps only the LAST token per stream, so the map
                // stays bounded and the loser's retry (different
                // random) applies.
                ManifestTable.merge(data,
                  java.util.concurrent.ThreadLocalRandom.current()
                    .nextLong(Long.MaxValue),
                  mp, root, data.schema,
                  numBuckets = m.numBuckets,
                  streamId = "graft-sql-insert")
              }
            }
        }
    }
  }
}

/** Carrier scan: holds what the strategy needs and reports
  * manifest-derived statistics; never executes itself.
  *
  * The substituted plans are MEMOIZED per scan instance: AQE re-plans
  * the captured logical plan after every stage, re-invoking the
  * strategy — a fresh `ManifestTable.read` each time would mint new
  * expression ids, its query stages would never semantically match the
  * ones already materialized, and the adaptive loop would wait forever
  * (reproduced by a self-join under AQE). Same scan + same filters →
  * the identical plan object, so re-planning converges. */
private[store] case class GraftBatchScan(
    root: String,
    versionAsOf: Option[Long],
    tableSchema: StructType,
    startingVersion: Option[String] = None,
    maxVersionsPerBatch: Option[Int] = None)
    extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = tableSchema
  override def description(): String =
    s"GraftScan $root" + versionAsOf.map(v => s" @v$v").getOrElse("")

  /** `spark.readStream.table("graft.db.t")` / `readStream.format
    * ("graft").load(root)`: the table's commits as a stream of plain
    * TABLE-schema rows (inserts + update postimages; ranges containing
    * deletes refuse — stream `format("graft-cdc")` for full CDC). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(versionAsOf.isEmpty,
      "cannot stream a time-travelled snapshot (it never changes); " +
        "use versionAsOf-free reads, or startingVersion to begin the " +
        "stream at a past commit")
    new graft.streaming.CdcMicroBatchStream(SparkSession.active, root,
      tableSchema, keyOverride = None, startingVersion,
      maxVersionsPerBatch, checkpointLocation, upsertsOnly = true)
  }

  @transient private lazy val baseDf: org.apache.spark.sql.DataFrame = {
    val spark = SparkSession.active
    versionAsOf match {
      case Some(v) => ManifestTable.readAt(spark, root, tableSchema, v)
      case None => ManifestTable.read(spark, root, tableSchema)
    }
  }

  /** Substituted-plan output attributes, by name (stable per scan). */
  @transient private[store] lazy val outputByName
      : Map[String, Expression] =
    baseDf.queryExecution.analyzed.output
      .map(a => (a.name, a: Expression)).toMap

  @transient private lazy val planCache =
    new java.util.concurrent.ConcurrentHashMap[Expression, LogicalPlan]()
  @transient private lazy val unfiltered: LogicalPlan =
    baseDf.queryExecution.optimizedPlan

  /** The read plan with `cond` (already rebased onto [[outputByName]])
    * pushed through the subtree's own optimization — filter pushdown
    * into the reconcile levels, GraftFileIndex key pruning, parquet
    * row-group pushdown all fire even though the main optimizer has
    * already run by the time the strategy swaps. */
  private[store] def substituted(cond: Option[Expression]): LogicalPlan =
    cond match {
      case None => unfiltered
      case Some(c) =>
        planCache.computeIfAbsent(c.canonicalized, _ =>
          baseDf.filter(org.apache.spark.sql.graft.Bridge.column(c))
            .queryExecution.optimizedPlan)
    }

  override def toBatch: Batch = throw new IllegalStateException(
    "the graft batch source plans through GraftReadStrategy — build the " +
      "session with GraftExtensions (spark.sql.extensions / " +
      "withExtensions) or call GraftExtensions.register(spark) first")

  /** Per-column NDV/null-count for the optimizer, folded driver-side
    * from the [[ColStats]] `colstats` sidecar (the incremental ANALYZE
    * output): only columns whose coverage is FULL on a single-seq
    * table report — partial or chain-overcounted stats must not steer
    * a join reorder. Never-analyzed tables pay one fs.exists. Lazy +
    * per-scan cached: planning consults statistics once per relation. */
  @transient private lazy val colStatsMap: java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val out = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    val spark = SparkSession.active
    val m = versionAsOf match {
      case Some(v) => Some(ManifestTable.readManifest(spark, root, v))
      case None => ManifestTable.currentManifest(spark, root)
    }
    m.foreach { mf =>
      ColStats.liveStats(spark, root, mf).foreach {
        case (c, st) if st.full =>
          out.put(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(c),
            new org.apache.spark.sql.connector.read.colstats
                .ColumnStatistics {
              override def distinctCount(): OptionalLong =
                OptionalLong.of(st.ndv)
              override def nullCount(): OptionalLong =
                OptionalLong.of(st.nulls)
            })
        case _ => ()
      }
    }
    out
  }

  override def estimateStatistics(): Statistics = {
    val spark = SparkSession.active
    val m = versionAsOf match {
      case Some(v) => Some(ManifestTable.readManifest(spark, root, v))
      case None => ManifestTable.currentManifest(spark, root)
    }
    new Statistics {
      override def sizeInBytes(): OptionalLong = m match {
        case Some(mf) if mf.entries.nonEmpty &&
            mf.entries.forall(_.bytes > 0) =>
          OptionalLong.of(mf.entries.map(_.bytes).sum)
        case Some(mf) if mf.entries.isEmpty => OptionalLong.of(0L)
        case _ => OptionalLong.empty()
      }
      // Exact only when every bucket is compacted: a delta-updated key
      // is counted in both its base and delta file, and a tombstone's
      // key rows are erasures, not data.
      override def numRows(): OptionalLong = m match {
        case Some(mf)
            if mf.entries.forall(!_.tomb) &&
              mf.entries.groupBy(_.bucket).values.forall(_.size == 1) =>
          OptionalLong.of(mf.entries.map(_.rows).sum)
        case _ => OptionalLong.empty()
      }
      // ANALYZE-fed column stats (NDV + null count) for CBO join
      // reorder / selectivity: what makes the incremental stats an
      // OPTIMIZER input instead of an observability report.
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats
            .ColumnStatistics] = colStatsMap
    }
  }
}

/** Plans a [[GraftBatchScan]] relation as the `ManifestTable.read` /
  * `readAt` plan with the query's own filters and projects rebased into
  * the subtree (then re-optimized), so the native scan path's pruning
  * and pushdown fire exactly as they do for the Scala/SQL-function
  * reads. */
private[store] object GraftAggScan {
  /** One pushed aggregate. Min/Max carry their ANSWER (the rendered
    * zone extreme, `None` = SQL NULL), frozen when the pushdown is
    * accepted — metadata-only by then, and freezing keeps the scan
    * deterministic across AQE re-planning. CountStar stays a marker:
    * its value may need a bounded delta-reconcile job, which belongs
    * at batch planning, not in the optimizer. */
  sealed trait PushedAgg extends Serializable
  case object PushedCount extends PushedAgg
  final case class PushedMin(column: String, rendered: Option[String])
      extends PushedAgg
  final case class PushedMax(column: String, rendered: Option[String])
      extends PushedAgg
}

/** The aggregate-pushdown scan: `SELECT count(*) / min(c) / max(c)
  * FROM t` (any face — catalog name, path read, time travel) answers
  * from MANIFEST + ZONE METADATA instead of scanning the table.
  * count(*) = [[ManifestTable.countRows]] — exact at any size
  * (all-compacted buckets come straight off recorded row counts, delta
  * buckets reconcile and count for real). min/max = the zone sidecar
  * extremes ([[ZoneSkip.zoneMinMax]] — accepted only when exact), the
  * rendered strings converted back to the column's internal values
  * ([[ZoneSkip.internalOf]]). Zero data reads on the common case, one
  * row out, `inputFiles` empty: the 100 TB `count(*), min(ts), max(ts)`
  * costs a manifest read plus a sidecar read. */
private[store] case class GraftAggScan(
    root: String,
    versionAsOf: Option[Long],
    tableSchema: StructType,
    aggs: Seq[GraftAggScan.PushedAgg]) extends Scan {
  import GraftAggScan._

  override def readSchema(): StructType = StructType(
    aggs.zipWithIndex.map {
      case (PushedCount, i) => org.apache.spark.sql.types.StructField(
        s"count_$i", org.apache.spark.sql.types.LongType,
        nullable = false)
      case (PushedMin(c, _), i) => org.apache.spark.sql.types.StructField(
        s"min_$i", tableSchema(c).dataType, nullable = true)
      case (PushedMax(c, _), i) => org.apache.spark.sql.types.StructField(
        s"max_$i", tableSchema(c).dataType, nullable = true)
    })

  override def description(): String =
    s"GraftAggScan $root (metadata aggregate pushdown: " +
      aggs.map {
        case PushedCount => "count(*)"
        case PushedMin(c, _) => s"min($c)"
        case PushedMax(c, _) => s"max($c)"
      }.mkString(", ") + ")" +
      versionAsOf.map(v => s" @v$v").getOrElse("")

  override def toBatch: Batch = new Batch {
    override def planInputPartitions()
        : Array[org.apache.spark.sql.connector.read.InputPartition] = {
      val spark = SparkSession.active
      lazy val count: Long = {
        val m = versionAsOf match {
          case Some(v) => Some(ManifestTable.readManifest(spark, root, v))
          case None => ManifestTable.currentManifest(spark, root)
        }
        ManifestTable.countRows(spark, root, tableSchema, m)
      }
      val values: Array[Any] = aggs.map {
        case PushedCount => count: Any
        case PushedMin(c, r) =>
          r.map(ZoneSkip.internalOf(_, tableSchema(c).dataType)).orNull
        case PushedMax(c, r) =>
          r.map(ZoneSkip.internalOf(_, tableSchema(c).dataType)).orNull
      }.toArray
      Array(GraftAggPartition(values))
    }
    override def createReaderFactory()
        : org.apache.spark.sql.connector.read.PartitionReaderFactory =
      GraftAggReaderFactory
  }
}

private[store] case class GraftAggPartition(values: Array[Any])
    extends org.apache.spark.sql.connector.read.InputPartition

private[store] object GraftAggReaderFactory
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(
      p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val part = p.asInstanceOf[GraftAggPartition]
      private var served = false
      override def next(): Boolean = !served && { served = true; true }
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          part.values)
      override def close(): Unit = ()
    }
}

class GraftReadStrategy(spark: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PhysicalOperation(projects, filters, rel: DataSourceV2ScanRelation)
        if rel.scan.isInstanceOf[GraftBatchScan] =>
      val scan = rel.scan.asInstanceOf[GraftBatchScan]
      // Rebase the outer expressions (which reference the V2 relation's
      // attribute ids) onto the substituted plan's output, BY NAME; the
      // project list re-aliases back to the original ids so everything
      // above the swap keeps resolving. All inputs here are stable
      // across AQE re-planning, so the produced plan is too (see the
      // GraftBatchScan memo note).
      val byName = scan.outputByName
      def rb(e: Expression): Expression = e.transform {
        case a: Attribute => byName(a.name)
      }
      val inner = scan.substituted(
        if (filters.isEmpty) None else Some(filters.map(rb).reduce(And)))
      val outList: Seq[NamedExpression] =
        (if (projects.nonEmpty) projects else rel.output).map {
          case a: AttributeReference =>
            Alias(byName(a.name), a.name)(exprId = a.exprId,
              qualifier = a.qualifier)
          case ne => rb(ne).asInstanceOf[NamedExpression]
        }
      planLater(Project(outList, inner)) :: Nil
    case _ => Nil
  }
}
