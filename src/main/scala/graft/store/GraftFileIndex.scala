package graft.store

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}

import graft.store.ManifestTable.{FileEntry, Manifest}

/** The manifest table's NATIVE Spark scan: a [[FileIndex]] backed by the
  * manifest's file inventory instead of filesystem listing, plugged into
  * the same `HadoopFsRelation`/`FileSourceScanExec` machinery every
  * parquet read uses (the Delta/Hudi integration point). Three things
  * the plain `spark.read.parquet(paths)` scan it replaces could not do:
  *
  *  1. ZERO-LISTING PLANNING. Format-8 manifests record each entry's
  *     concrete data file and byte size, so planning synthesizes the
  *     `FileStatus` it needs from the manifest alone — no `listStatus`
  *     storms against 400k bucket directories at 100 TB, and
  *     `sizeInBytes` (what the optimizer's broadcast decisions read)
  *     comes straight off the manifest. Pre-8 entries
  *     (directory-granular, no recorded size) fall back to listing,
  *     once, cached — committed data files are immutable.
  *
  *  2. KEY-PREDICATE FILE PRUNING AT PLAN TIME. `listFiles` receives the
  *     query's pushed data filters, so a `WHERE key = x` (or IN, or a
  *     range over a string-keyed layout) anywhere above the read — plain
  *     SQL over `graft_table(...)`, a DataFrame filter, a pruning
  *     subquery — reads only the buckets the probe keys hash to, with
  *     the same normalized-probe + min/max-stats discipline as
  *     [[ManifestTable.lookup]]. Pruning is CONSERVATIVE: unsupported
  *     predicate shapes keep everything, kept files still re-filter in
  *     the scan, so a missed opportunity costs I/O, never correctness.
  *     Key pruning only runs when the manifest PROVES the layout
  *     normalizer ([[GraftScan.frame]]): a recorded keyExpr, or a
  *     format-8 recorded-identity layout — never guessed for legacy
  *     tables whose comparator the manifest couldn't record.
  *
  *  3. LAYOUT-AWARE EXECUTION. When the layout provably matches Spark's
  *     own bucketing semantics ([[GraftScan.bucketSpecOf]]), the
  *     relation reports a `BucketSpec`: joins between co-bucketed
  *     tables and `groupBy(key)` aggregations run WITHOUT an Exchange,
  *     and compacted (single-file) buckets report their within-file key
  *     sort so sort-merge joins skip the Sort too. Spark's
  *     `DisableUnnecessaryBucketedScan` keeps scans that gain nothing
  *     on regular size-based splits.
  *
  * Instances are driver-side planning objects (never serialized to
  * executors), built per query, so the only mutable state — listing and
  * probe memo caches — needs no invalidation. */
private[store] final class GraftFileIndex(
    spark: SparkSession,
    root: String,
    keyColumn: String,
    keyType: Option[org.apache.spark.sql.types.DataType],
    probeEval: Option[Seq[Any] => Seq[(Int, String)]],
    rangePrunable: Boolean,
    keyZone: Option[String],
    entries: Seq[FileEntry]) extends FileIndex {

  private def canPrune: Boolean = probeEval.isDefined

  override def rootPaths: Seq[Path] = Seq(new Path(root))
  override def partitionSchema: StructType = StructType(Nil)
  override def refresh(): Unit = ()

  /** listStatus results for directory-granular (pre-format-8) entries;
    * file-granular entries never touch the filesystem. */
  private val listCache = mutable.HashMap.empty[String, Array[FileStatus]]

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  private def statusesOf(e: FileEntry): Array[FileStatus] =
    if (e.bytes > 0 && e.relPath.endsWith(".parquet")) {
      // Synthesized from the manifest: path + length are all the split
      // planner and the parquet reader consult (mod time / block info
      // are not; immutable files have no staleness to detect).
      Array(new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L,
        new Path(ManifestTable.dataPath(root, e))))
    } else listCache.getOrElseUpdate(e.relPath, {
      val p = new Path(ManifestTable.dataPath(root, e))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isFile) Array(st)
      else fs.listStatus(p).filter(s =>
        s.isFile && isDataFile(s.getPath.getName))
    })

  override def inputFiles: Array[String] =
    entries.toArray.flatMap(statusesOf(_)).map(_.getPath.toString)

  override def sizeInBytes: Long =
    entries.map(e =>
      if (e.bytes > 0) e.bytes else statusesOf(e).map(_.getLen).sum).sum

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (!canPrune || entries.isEmpty) entries
      else {
        val preds = dataFilters.flatMap(keepPredicate)
        if (preds.isEmpty) entries
        else entries.filter(e => preds.forall(_(e)))
      }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.toArray.flatMap(statusesOf(_))))
  }

  // ----------------------------------------------------------- pruning

  /** Memo per canonicalized filter: AQE re-planning re-lists the same
    * scan, and probe evaluation runs a (tiny, driver-local) Spark job. */
  private val predCache =
    mutable.HashMap.empty[Expression, Option[FileEntry => Boolean]]

  /** Only prune on a literal whose type IS the key column's type (the
    * analyzer coerces comparisons, so this is the normal case): the
    * compiled probe projection takes exactly key-typed internal
    * values. */
  private def keyTyped(dt: org.apache.spark.sql.types.DataType): Boolean =
    keyType.contains(dt)

  private def isKeyAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == keyColumn
    case _ => false
  }

  /** Survival predicate for a set of equality probe values (catalyst
    * INTERNAL representation, same type as the key column): bucket
    * match plus min/max stat containment, probes normalized and
    * rendered by the pre-compiled projection
    * ([[ManifestTable.probeEvaluator]] — the bucket targeting and the
    * string the stats compare against must be exactly what the write
    * path computed; no session/analyzer access here, this runs on AQE
    * stage threads). Sound under ANY comparator: a row whose RAW key
    * equals the probe necessarily normalizes like it. */
  private def probePredicate(values: Seq[Any]): Option[FileEntry => Boolean] = {
    val nonNull = values.filter(_ != null)
    if (nonNull.isEmpty) return Some(_ => false) // `= NULL` matches no row
    // Per-bucket SORTED probe strings + binary search per entry — the
    // same O(E log P) shape as lookup(); a linear probes.exists is real
    // driver time at 400k entries × a big IN list.
    val byBucket: Map[Int, Array[String]] = probeEval.get(nonNull)
      .filter(_._2 != null) // a NULL-normalized probe equals no stored key
      .groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2).toArray.sorted }
    def anyInRange(sorted: Array[String], lo: String, hi: String): Boolean = {
      var l = 0; var r = sorted.length
      while (l < r) { // first index with sorted(i) >= lo
        val mid = (l + r) >>> 1
        if (sorted(mid) < lo) l = mid + 1 else r = mid
      }
      l < sorted.length && sorted(l) <= hi
    }
    Some(e => byBucket.get(e.bucket)
      .exists(anyInRange(_, e.minKey, e.maxKey)))
  }

  /** Range-shape stat comparisons are only sound when the raw-key order
    * the predicate speaks IS the rendered-stats order: identity
    * normalization over a string key ([[GraftScan.frame]] sets
    * `rangePrunable`); endpoints are inclusive-widened so strictness
    * never over-prunes. Entries whose stats are null-only (`""`) hold
    * only NULL keys, which no range predicate matches. */
  private def keepPredicate(f: Expression): Option[FileEntry => Boolean] =
    predCache.getOrElseUpdate(f.canonicalized, computePredicate(f))

  private def str(v: Any): Option[String] =
    Option(v).map(_.toString) // UTF8String renders as its string value

  /** Numeric-key range predicates against the per-entry KEY ZONES
    * (`minZ`/`maxZ`, order-true domain — see [[ZoneSkip.keyKind]]).
    * Inclusive-widened (strictness never over-prunes); an entry with
    * EMPTY zone stats keeps (legacy manifest — conservative) unless its
    * lexical stats mark it null-only (`""`/`""`), which no range
    * matches. Sound per FILE across seq levels for the same reason the
    * equality path is: the predicate is on the KEY, and an overriding
    * row carries the same key as its victim. */
  private def zoneLo(v: Any): Option[FileEntry => Boolean] =
    keyZone.flatMap { kind =>
      Option(v).map(x => ZoneSkip.keyRenderInternal(x)).map(s => (e: FileEntry) =>
        !(e.minKey.isEmpty && e.maxKey.isEmpty) &&
          (e.maxZ.isEmpty || ZoneSkip.cmp(kind, e.maxZ, s) >= 0))
    }

  private def zoneHi(v: Any): Option[FileEntry => Boolean] =
    keyZone.flatMap { kind =>
      Option(v).map(x => ZoneSkip.keyRenderInternal(x)).map(s => (e: FileEntry) =>
        !(e.minKey.isEmpty && e.maxKey.isEmpty) &&
          (e.minZ.isEmpty || ZoneSkip.cmp(kind, e.minZ, s) <= 0))
    }

  private def computePredicate(f: Expression): Option[FileEntry => Boolean] =
    f match {
      case EqualTo(a, Literal(v, dt)) if isKeyAttr(a) && keyTyped(dt) =>
        probePredicate(Seq(v))
      case EqualTo(Literal(v, dt), a) if isKeyAttr(a) && keyTyped(dt) =>
        probePredicate(Seq(v))
      case EqualNullSafe(a, Literal(v, dt))
          if isKeyAttr(a) && keyTyped(dt) && v != null =>
        probePredicate(Seq(v))
      case EqualNullSafe(Literal(v, dt), a)
          if isKeyAttr(a) && keyTyped(dt) && v != null =>
        probePredicate(Seq(v))
      case In(a, list) if isKeyAttr(a) && list.forall {
            case Literal(_, dt) => keyTyped(dt); case _ => false } =>
        probePredicate(list.map { case Literal(v, _) => v })
      case InSet(a, hset) if isKeyAttr(a) && keyTyped(a.dataType) =>
        probePredicate(hset.toSeq)
      // Range shapes: the key is a recorded-identity STRING, so a
      // string-literal endpoint compares in exactly the stats space.
      case GreaterThan(a, Literal(v, StringType))
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(lo => e => e.maxKey >= lo)
      case GreaterThanOrEqual(a, Literal(v, StringType))
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(lo => e => e.maxKey >= lo)
      case LessThan(a, Literal(v, StringType))
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(hi => e => e.minKey <= hi)
      case LessThanOrEqual(a, Literal(v, StringType))
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(hi => e => e.minKey <= hi)
      case GreaterThan(Literal(v, StringType), a)
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(hi => e => e.minKey <= hi)
      case GreaterThanOrEqual(Literal(v, StringType), a)
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(hi => e => e.minKey <= hi)
      case LessThan(Literal(v, StringType), a)
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(lo => e => e.maxKey >= lo)
      case LessThanOrEqual(Literal(v, StringType), a)
          if isKeyAttr(a) && rangePrunable =>
        str(v).map(lo => e => e.maxKey >= lo)
      // Numeric-family range shapes against the per-entry key zones —
      // the literal must carry the key's own type (analyzer-coerced
      // normal case), so its internal value renders into exactly the
      // domain the writer aggregated.
      case GreaterThan(a, Literal(v, dt))
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneLo(v)
      case GreaterThanOrEqual(a, Literal(v, dt))
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneLo(v)
      case LessThan(a, Literal(v, dt))
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneHi(v)
      case LessThanOrEqual(a, Literal(v, dt))
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneHi(v)
      case GreaterThan(Literal(v, dt), a)
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneHi(v)
      case GreaterThanOrEqual(Literal(v, dt), a)
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneHi(v)
      case LessThan(Literal(v, dt), a)
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneLo(v)
      case LessThanOrEqual(Literal(v, dt), a)
          if isKeyAttr(a) && keyTyped(dt) && keyZone.isDefined =>
        zoneLo(v)
      case And(l, r) =>
        (computePredicate(l), computePredicate(r)) match {
          case (Some(pl), Some(pr)) => Some(e => pl(e) && pr(e))
          case (one @ Some(_), None) => one // one conjunct still prunes
          case (None, one) => one
          case _ => None
        }
      case Or(l, r) =>
        // BOTH branches must prune: an un-analyzable branch could match
        // rows in any file.
        for (pl <- computePredicate(l); pr <- computePredicate(r))
          yield (e: FileEntry) => pl(e) || pr(e)
      case _ => None
    }
}

/** Builds the DataFrame for a set of manifest entries through
  * [[GraftFileIndex]] — the one place a manifest's files become a Spark
  * relation. */
private[store] object GraftScan {

  /** The layout normalizer is PROVEN by the manifest: either it records
    * the keyExpr SQL, or it is a format-8 manifest recording an identity
    * layout (`keyExpr` empty, `udfKey` false — pre-8 manifests can't
    * distinguish identity from an unrecordable UDF comparator, so
    * legacy empty-keyExpr tables never key-prune). */
  private def provenLayout(m: Manifest): Boolean =
    m.keyColumn.nonEmpty && !m.udfKey &&
      (m.keyExpr.nonEmpty || m.format >= 8)

  private def recordedIdentity(m: Manifest): Boolean =
    m.format >= 8 && !m.udfKey && m.keyExpr.isEmpty

  /** Spark-native `BucketSpec` for layouts that provably match Spark's
    * own bucketing semantics: hash layout (`pmod(hash(key), n)` — the
    * exact expression `HashPartitioning.partitionIdExpression` uses),
    * recorded-IDENTITY key normalization, and every live file carrying
    * the Spark bucket-id name suffix the format-8 writer stamps. With
    * the spec reported, a join of two co-bucketed tables or a
    * `groupBy(key)` runs with NO Exchange, and a compacted bucket (one
    * file) additionally reports its within-file key sort so sort-merge
    * joins skip the Sort. */
  private[store] def bucketSpecOf(
      m: Manifest, entries: Seq[FileEntry],
      physSchema: StructType): Option[BucketSpec] = {
    // The spec describes the INNER file relation, which reads physical
    // names (column mapping): name the physical key, checked against
    // the physical schema.
    val physKey = ManifestTable.physicalOf(m, m.keyColumn)
    // A split table's leaf ids exceed numBuckets and no longer match
    // Spark's own hash-bucket addressing — the BucketSpec claim (and
    // its co-bucketed-join promise) must decline, never lie.
    if (m.splits.isEmpty &&
        m.rangeBounds.isEmpty && recordedIdentity(m) &&
        m.keyColumn.nonEmpty && m.numBuckets > 0 &&
        // BucketSpec itself refuses counts above
        // spark.sql.sources.bucketing.maxBuckets (default 100k) — a
        // wider table (100 TB / 256 MB ≈ 400k buckets) must fall back
        // to an unbucketed scan, not fail planning.
        m.numBuckets <= org.apache.spark.sql.internal.SQLConf.get
          .bucketingMaxBuckets &&
        physSchema.fieldNames.contains(physKey) &&
        entries.nonEmpty && entries.forall(_.named))
      // The within-file KEY sort is only claimable while the writer's
      // key-sorted invariant provably holds table-wide: a clusterBy
      // re-layout sorts files by the CLUSTER column instead, and a
      // false sort claim would let a sort-merge join skip its Sort on
      // unsorted data. Bucketing (the zero-Exchange property) survives
      // either way — clustering respects bucket assignment.
      Some(BucketSpec(m.numBuckets, Seq(physKey),
        if (m.clusterCol.isEmpty) Seq(physKey) else Nil))
    else None
  }

  /** One pruned, stats-backed relation over `entries`. `cmp` must be the
    * table's layout normalizer as resolved by the caller
    * ([[ManifestTable.effectiveKey]] / the recorded keyExpr); pruning
    * additionally requires the manifest to PROVE it (see
    * [[provenLayout]]) so a legacy table whose comparator was never
    * recorded reads unpruned rather than mis-pruned. */
  private[store] def frame(
      spark: SparkSession,
      root: String,
      m: Manifest,
      entries: Seq[FileEntry],
      schema: StructType,
      cmp: Column => Column): DataFrame = {
    val rangeOk = recordedIdentity(m) &&
      schema.find(_.name == m.keyColumn).exists(_.dataType == StringType)
    val keyType = schema.find(_.name == m.keyColumn).map(_.dataType)
    // numeric-family identity keys range-prune through the per-entry
    // key zones (minZ/maxZ) the format-9 writer records
    val keyZone =
      if (recordedIdentity(m)) keyType.flatMap(ZoneSkip.keyKind)
      else None
    // The probe projection is compiled HERE — relation construction is a
    // thread where running the analyzer is legal — and handed to the
    // index as a pure evaluator; listFiles (AQE stage threads) must
    // never need the analyzer or the SessionCatalog.
    val probeEval =
      if (provenLayout(m) && keyType.isDefined)
        ManifestTable.probeEvaluator(spark, m.numBuckets, m.rangeBounds,
          m.splits, m.keyColumn, keyType.get, cmp)
      else None
    // COLUMN MAPPING: the relation reads files under their PHYSICAL
    // names (data files never change on a rename — Manifest.colMap),
    // then a Project aliases back to the logical names every caller
    // speaks. Filters pushed through the aliases reach the FileIndex in
    // physical attribute space, so the index matches the physical key;
    // ProjectExec is alias-aware, so the BucketSpec partitioning and
    // the within-file sort claim survive the rename projection.
    val physSchema = ManifestTable.toPhysicalSchema(m, schema)
    val physKey = ManifestTable.physicalOf(m, m.keyColumn)
    val idx = new GraftFileIndex(spark, root, physKey, keyType,
      probeEval, rangePrunable = rangeOk, keyZone, entries)
    val rel = HadoopFsRelation(
      location = idx,
      partitionSchema = StructType(Nil),
      dataSchema = physSchema,
      bucketSpec = bucketSpecOf(m, entries, physSchema),
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val raw = org.apache.spark.sql.graft.RelationBridge.ofRows(
      spark, LogicalRelation(rel))
    if (m.colMap.isEmpty) raw
    else raw.select(schema.fieldNames.toSeq.map(n =>
      org.apache.spark.sql.functions.col(
        ManifestTable.physicalOf(m, n)).as(n)): _*)
  }
}
