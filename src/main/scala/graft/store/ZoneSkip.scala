package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-FILE column min/max ZONE MAPS for the manifest table: the
  * RANGE-predicate complement to [[BloomSkip]] (equality/IN) — a
  * `WHERE price BETWEEN x AND y` reads only the buckets whose files'
  * recorded ranges intersect the probe, instead of scanning the table.
  * Same zero-maintenance contract: data files are IMMUTABLE, so a
  * file's (min, max) never goes stale; a build covers exactly the
  * current files no committed sidecar covers yet, and repeated builds
  * are incremental no-ops. Parquet footers carry the same statistics
  * per row group, but only AFTER every file is opened — a zone sidecar
  * answers at PLANNING time from one tiny parquet, which is the
  * difference between touching 400k files and touching 40 at 100 TB.
  *
  * STORAGE: `zones/v<version>-<attempt>[-r<rev>]` sidecars — rows of
  * (relPath, column, kind, minS, maxS, nonNull) — committed/resolved/
  * vacuumed through the additive side-dir rules shared with bloom
  * ([[ManifestTable.committedAdditiveDirs]]); readers keep the newest
  * row per (file, column).
  *
  * PRUNING IS BUCKET-GRANULAR, inherited from [[BloomSkip]] and a
  * correctness requirement with LSM delta files: dropping ONE file of
  * a bucket can resurrect a row a later delta overrode. A bucket skips
  * iff EVERY live file is covered and every range misses the probe.
  *
  * ORDER DISCIPLINE: min/max are computed BY SPARK over the column's
  * native type and stored as canonical strings — integrals exactly,
  * fractionals through an exact widening to double (`Double.toString`
  * round-trips), strings verbatim. The driver-side prune compares in
  * the SAME order Spark's `>=`/`<=` will post-filter by: numeric order
  * for the numeric kinds, CODE-POINT order for strings (Spark compares
  * UTF-8 bytes, which is code-point order; naive `String.compareTo`
  * is UTF-16 code-unit order and DIVERGES above U+FFFF — using it
  * could wrongly skip a file holding supplementary characters). */
object ZoneSkip {

  /** Comparison domain of a column's zone entries. */
  private[graft] def kindOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "long"
    case TimestampType | TimestampNTZType => "long" // micros since epoch
    case DateType => "long" // days since epoch: ISO strings LOOK sortable
    // but Spark renders years > 9999 with a '+' prefix and BCE years with
    // '-', so lexical order diverges from chronological there — epoch
    // days are monotone and exact at any year
    case FloatType | DoubleType => "double"
    case StringType => "string"
    case other => throw new IllegalArgumentException(
      s"zone maps support integral/fractional/string/date/timestamp " +
        s"columns, not ${other.sql}")
  }

  /** The rendering expression whose min/max the build stores: exact in
    * the kind's comparison domain. Rendering BEFORE aggregating (vs
    * aggregating natively then casting) is deliberate for dates:
    * min-of-ISO-strings == ISO-string-of-min, and one code path per
    * type keeps build and probe in the same domain by construction.
    * Timestamps render as exact epoch micros (`unix_micros` — a string
    * rendering would drop sub-second digits and over-prune); NTZ pins
    * through the session zone, UTC repo-wide. */
  private def rendered(c: org.apache.spark.sql.Column,
      dt: DataType): org.apache.spark.sql.Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType => unix_date(c).cast(LongType)
    case _ => kindOf(dt) match {
      case "long" => c.cast(LongType)
      // `+ 0.0` collapses -0.0 to 0.0 (and nothing else): Spark's
      // >=/<= treat the two as EQUAL while Double.compare orders
      // -0.0 < 0.0, so an un-normalized "-0.0" max probed with an
      // inclusive lo of 0.0 would wrongly mark the file absent
      case "double" => c.cast(DoubleType) + lit(0.0d)
      case "string" => c.cast(StringType)
    }
  }

  /** UTF-8 byte order == code point order; this matches Spark's string
    * comparison where UTF-16 `compareTo` does not (surrogates). */
  private[store] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return java.lang.Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    java.lang.Integer.compare(a.length - i, b.length - j)
  }

  /** Zone domain for KEY-column per-entry stats ([[ManifestTable]]'s
    * `minZ`/`maxZ`): only the types whose Catalyst INTERNAL value
    * renders EXACTLY into the comparison domain with no session state —
    * integrals (the value), TimestampType (internal epoch micros),
    * DateType (internal epoch days), float/double (normalized). Strings
    * are excluded (the lexical `minKey` path already serves them) and
    * so is TimestampNTZ, whose rendering pins through the SESSION zone:
    * a manifest written under one zone read under another would
    * mis-prune. */
  private[store] def keyKind(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some("long")
    case TimestampType => Some("long")
    case DateType => Some("long")
    case FloatType | DoubleType => Some("double")
    case _ => None
  }

  /** The write-side rendering matching [[keyKind]] — identical order
    * semantics to what [[keyRenderInternal]] computes driver-side from
    * the probe literal's internal value. */
  private[store] def keyRendered(c: org.apache.spark.sql.Column,
      dt: DataType): Option[org.apache.spark.sql.Column] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(c.cast(LongType))
    case TimestampType => Some(unix_micros(c))
    case DateType => Some(unix_date(c).cast(LongType))
    case FloatType | DoubleType => Some(c.cast(DoubleType) + lit(0.0d))
    case _ => None
  }

  /** Probe-literal rendering into the SAME domain, from the Catalyst
    * internal value, pure driver-side (listFiles runs on AQE stage
    * threads — no analyzer, no session): internal integrals/micros/days
    * are the domain already; floats widen exactly as Spark's cast and
    * -0.0 normalizes like the build. */
  private[store] def keyRenderInternal(v: Any): String = v match {
    case d: Double => (d + 0.0d).toString
    case f: Float => (f.toDouble + 0.0d).toString
    case other => String.valueOf(other)
  }

  private[store] def cmp(kind: String, a: String, b: String): Int = kind match {
    case "long" => java.lang.Long.compare(a.toLong, b.toLong)
    // + 0.0 mirrors `rendered`'s -0.0 normalization so sidecars written
    // BEFORE that normalization still compare in Spark's order
    case "double" =>
      java.lang.Double.compare(a.toDouble + 0.0d, b.toDouble + 0.0d)
    case "string" => codePointCompare(a, b)
  }

  /** Renders one probe bound into its kind's string domain WITHOUT a
    * Spark job: the literal-only tree projects over a one-row
    * LocalRelation, which constant-folds to a `LocalTableScan` whose
    * collect is driver-side — unlike the `spark.range(1)` it replaces
    * (RangeExec = one scheduler round-trip per bound on every lookup's
    * hot path). The tree is exactly `rendered(lit(v) cast dt)`, the
    * build's own rendering, so probe and zone share one domain by
    * construction. */
  private[graft] def renderBound(
      spark: SparkSession, v: Any, dt: DataType): Option[String] =
    Option(v).map { x =>
      val r = spark.createDataFrame(Seq(Tuple1(1)))
        .select(rendered(lit(x).cast(dt), dt).cast(StringType))
        .head().getString(0)
      require(r != null, s"bound $x renders to NULL as ${dt.sql}")
      r
    }

  private val zoneSchema = StructType(Seq(
    StructField("relPath", StringType),
    StructField("column", StringType),
    StructField("kind", StringType),
    StructField("minS", StringType),
    StructField("maxS", StringType),
    StructField("nonNull", BooleanType)))

  /** All committed zone rows, newest sidecar winning per
    * (file, column). Lazy frame; empty when no sidecar. */
  def zonesOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = ManifestTable.committedAdditiveDirs(spark, root, "zones")
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        zoneSchema)
    else {
      val all = dirs.zipWithIndex.map { case (d, i) =>
        spark.read.parquet(d).withColumn("_ord", lit(i))
      }.reduce(_ unionByName _)
      all.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("relPath"), col("column"))
            .orderBy(col("_ord").desc)))
        .filter(col("_rn") === 1)
        .drop("_ord", "_rn")
    }
  }

  /** Builds zone entries for every (current file, column) pair no
    * committed sidecar covers yet: ONE scan of the uncovered files,
    * one per-file min/max aggregate, one sidecar write. Returns the
    * number of (file, column) entries written (0 = already covered). */
  def buildZones(
      spark: SparkSession,
      root: String,
      schema: StructType,
      cols: Seq[String]): Int = {
    require(cols.nonEmpty, "need at least one column to zone-map")
    val kinds = cols.map { c =>
      require(schema.fieldNames.contains(c),
        s"column $c not in the schema")
      c -> kindOf(schema(c).dataType)
    }.toMap
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty) return 0
    // coverage is KIND-aware: a row whose kind no longer matches the
    // column's current domain (schema re-typed, or a date column zoned
    // under the legacy lexical-string kind) never prunes, so treat it
    // as uncovered and rebuild — the newer sidecar row wins on read
    val coveredRows = zonesOf(spark, root)
      .select(col("relPath"), col("column"), col("kind")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    def covered(rp: String, c: String): Boolean =
      coveredRows.get((rp, c)).contains(kinds(c))
    // shallow-clone ext entries never build: the file→relPath suffix
    // match below cannot key them, and their carried minZ/maxZ entry
    // stats still prune — uncovered files just never drop, which is
    // the sidecars' conservative default
    val todo = m.entries.filter(e => !ManifestTable.isExt(e) &&
      cols.exists(c => !covered(e.relPath, c)))
    if (todo.isEmpty) return 0
    val paths = todo.map(e => ManifestTable.dataPath(root, e))
    // column mapping: read under the files' PHYSICAL names, alias back
    // to logical (what the sidecar records and lookups probe by)
    val byFileRaw = spark.read
      .schema(ManifestTable.toPhysicalSchema(m, schema))
      .parquet(paths: _*)
      .withColumn("_file", input_file_name())
    val byFile =
      if (m.colMap.isEmpty) byFileRaw
      else byFileRaw.select((schema.fieldNames.toSeq.map(nm =>
        col(ManifestTable.physicalOf(m, nm)).as(nm)) :+ col("_file")): _*)
    // per column: min, max (rendered into the kind's domain as strings
    // — exact, see `rendered`), and a non-null witness
    val aggs = cols.flatMap { c =>
      val r = rendered(col(c), schema(c).dataType)
      Seq(min(r).cast(StringType).as(s"_min_$c"),
        max(r).cast(StringType).as(s"_max_$c"),
        max(col(c).isNotNull).as(s"_nn_$c"))
    }
    val perFile = byFile.groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    // absolute file → relPath by "/"-anchored suffix (format-8 entries
    // are files; legacy leaf-dir entries match on the parent) — the
    // BloomSkip discipline, incl. OR-merging several part files of one
    // leaf dir (here: min-of-mins / max-of-maxs / nonNull-or)
    val pairs = perFile.flatMap { r =>
      val f = r.getString(0)
      val parent = f.substring(0, math.max(0, f.lastIndexOf('/')))
      val rel = todo.map(_.relPath).find(rp =>
        f.endsWith("/" + rp) || parent.endsWith("/" + rp))
      rel.toSeq.flatMap(rp => cols.zipWithIndex.collect {
        case (c, i) if !covered(rp, c) =>
          ((rp, c), (r.getAs[String](1 + 3 * i),
            r.getAs[String](2 + 3 * i),
            !r.isNullAt(3 + 3 * i) && r.getBoolean(3 + 3 * i)))
      })
    }
    val rows = pairs.groupBy(_._1).map { case ((rp, c), vs) =>
      val k = kinds(c)
      val mins = vs.flatMap(v => Option(v._2._1))
      val maxs = vs.flatMap(v => Option(v._2._2))
      val nonNull = vs.exists(_._2._3)
      org.apache.spark.sql.Row(rp, c, k,
        if (mins.isEmpty) null else mins.minBy(identity)(
          Ordering.fromLessThan[String](cmp(k, _, _) < 0)),
        if (maxs.isEmpty) null else maxs.maxBy(identity)(
          Ordering.fromLessThan[String](cmp(k, _, _) < 0)),
        nonNull)
    }.toSeq
    if (rows.isEmpty) return 0
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), zoneSchema)
    ManifestTable.writeAdditiveSidecar(spark, root, m, df, "zones")
    rows.length
  }

  /** Range read on a zone-mapped (non-key) column: reads only the
    * buckets whose files' recorded ranges can intersect [lo, hi].
    * Either bound may be null (unbounded side); inclusivity per bound.
    * Exact at any reconciliation state — a bucket skips only when ALL
    * its live files are covered and ALL definitely miss the range
    * (range predicates never match NULL rows, so an all-null covered
    * file counts as a definite miss). The kept buckets re-filter in
    * the scan, so an uncovered or intersecting file costs correctness
    * nothing. */
  def lookupRange(
      spark: SparkSession,
      root: String,
      schema: StructType,
      column: String,
      lo: Any,
      hi: Any,
      loInclusive: Boolean = true,
      hiInclusive: Boolean = true): DataFrame = {
    require(lo != null || hi != null, "need at least one bound")
    require(schema.fieldNames.contains(column),
      s"column $column not in the schema")
    val kind = kindOf(schema(column).dataType)
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty)
      return ManifestTable.read(spark, root, schema).limit(0)
    // bounds rendered through the SAME expression tree the build
    // aggregated, so probe and zone can never disagree on a
    // representation — evaluated DRIVER-SIDE ([[renderBound]]): a zone
    // lookup launches zero extra Spark jobs for its bounds
    val dt = schema(column).dataType
    val loS = renderBound(spark, lo, dt)
    val hiS = renderBound(spark, hi, dt)
    val zones = zonesOf(spark, root).filter(col("column") === column)
      .select("relPath", "kind", "minS", "maxS", "nonNull").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
      .toMap // bounded by the table's file count, tiny rows
    def definitelyAbsent(rp: String): Boolean = zones.get(rp).exists {
      case (k, mn, mx, nonNull) =>
        k == kind && ( // a stale-kind row (schema re-typed) never prunes
          !nonNull || mn == null || mx == null ||
          loS.exists(l => cmp(k, mx, l) < (if (loInclusive) 0 else 1)) ||
          hiS.exists(h => cmp(k, mn, h) > (if (hiInclusive) 0 else -1)))
    }
    // bucket-granular in general; FILE-granular on single-seq buckets
    // (clusterBy'd layouts) — see ManifestTable.pruneAbsent
    val keep = ManifestTable.pruneAbsent(m.entries,
      e => definitelyAbsent(e.relPath))
    val base =
      if (keep.isEmpty) ManifestTable.read(spark, root, schema).limit(0)
      else ManifestTable.reconciledEntriesRead(spark, root, schema, m,
        keep)
    val c = col(column)
    val preds =
      loS.map(_ => if (loInclusive) c >= lit(lo).cast(dt)
        else c > lit(lo).cast(dt)).toSeq ++
      hiS.map(_ => if (hiInclusive) c <= lit(hi).cast(dt)
        else c < lit(hi).cast(dt))
    base.filter(preds.reduce(_ && _))
  }

  /** MIN/MAX served from zone metadata, for the aggregate-pushdown
    * scan: returns `None` when zones cannot answer EXACTLY — any bucket
    * carrying deltas (a superseded row may hold a phantom extremum),
    * any live file uncovered for the column, a kind mismatch (schema
    * re-type), or a TimestampNTZ column (its rendering pins through the
    * session zone — a sidecar built under another zone would lie).
    * `Some((min, max))` carries the RENDERED extremes (each `None` when
    * every file is all-NULL in the column — SQL min/max of nothing);
    * zone min/max are computed from the data by the build, so the
    * answer is exact, not approximate. */
  private[store] def zoneMinMax(
      spark: SparkSession,
      root: String,
      m: ManifestTable.Manifest,
      column: String,
      dt: DataType): Option[(Option[String], Option[String])] = {
    if (dt == TimestampNTZType) return None
    val kind =
      try kindOf(dt)
      catch { case _: IllegalArgumentException => return None }
    if (m.entries.isEmpty) return Some((None, None))
    if (m.entries.exists(_.tomb) ||
        m.entries.groupBy(_.bucket).values.exists(_.size > 1)) return None
    val rows = zonesOf(spark, root).filter(col("column") === column)
      .select("relPath", "kind", "minS", "maxS", "nonNull").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
      .toMap
    if (!m.entries.forall(e =>
        rows.get(e.relPath).exists(_._1 == kind))) return None
    val live = m.entries.map(e => rows(e.relPath))
      .filter(z => z._4 && z._2 != null && z._3 != null)
    if (live.isEmpty) Some((None, None))
    else Some((
      Some(live.map(_._2).reduce((a, b) => if (cmp(kind, a, b) <= 0) a else b)),
      Some(live.map(_._3).reduce((a, b) => if (cmp(kind, a, b) >= 0) a else b))))
  }

  /** Rendered zone string back to the column's CATALYST INTERNAL value —
    * exact by construction of [[rendered]]: integrals/epoch-micros/
    * epoch-days ARE the internal domain, doubles round-trip through
    * `Double.toString`, floats narrow back exactly (the double was their
    * exact widening), strings are verbatim. */
  private[store] def internalOf(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toLong.toByte
    case ShortType => s.toLong.toShort
    case IntegerType => s.toLong.toInt
    case LongType => s.toLong
    case TimestampType => s.toLong
    case DateType => s.toLong.toInt
    case FloatType => s.toDouble.toFloat
    case DoubleType => s.toDouble
    case StringType =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case other => throw new IllegalArgumentException(
      s"no zone-internal conversion for ${other.sql}")
  }

  /** BOX probe over several zoned columns at once — the read shape a
    * [[ManifestTable.zOrderBy]] layout exists for. A file is skipped
    * when ANY column's zone proves its interval disjoint from that
    * column's [lo, hi] (inclusive; either bound may be null for a
    * half-open side, not both): per-column absence is independent, so
    * the union of exclusions is sound, and on a z-ordered layout every
    * file is tight in EVERY clustered dimension — the k-column box
    * keeps ~the product of the per-column file fractions instead of
    * one column's worth. Kept files re-filter on all predicates
    * (zone pruning never decides membership, only absence). */
  def lookupRanges(
      spark: SparkSession,
      root: String,
      schema: StructType,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "need at least one (column, lo, hi) range")
    ranges.foreach { case (c, lo, hi) =>
      require(schema.fieldNames.contains(c),
        s"column $c not in the schema")
      require(lo != null || hi != null,
        s"range on $c needs at least one bound")
    }
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty)
      return ManifestTable.read(spark, root, schema).limit(0)
    val keep = prunedEntries(spark, root, schema, m, ranges)
    val base =
      if (keep.isEmpty) ManifestTable.read(spark, root, schema).limit(0)
      else ManifestTable.reconciledEntriesRead(spark, root, schema, m,
        keep)
    val preds = ranges.flatMap { case (c, lo, hi) =>
      val dt = schema(c).dataType
      Option(lo).map(l => col(c) >= lit(l).cast(dt)).toSeq ++
        Option(hi).map(h => col(c) <= lit(h).cast(dt))
    }
    base.filter(preds.reduce(_ && _))
  }

  /** Zone-pruned reconciled read WITHOUT extra predicates: the frame
    * over only [[prunedEntries]]' files. For callers that re-apply
    * their own full predicate ([[graft.store.GraftDml]]'s UPDATE /
    * DELETE discovery) — sound exactly when every row the caller's
    * predicate matches satisfies the ranges (weaker-never-stronger). */
  private[store] def readHinted(
      spark: SparkSession,
      root: String,
      schema: StructType,
      m: ManifestTable.Manifest,
      ranges: Seq[(String, Any, Any)]): DataFrame = {
    if (m.entries.isEmpty)
      return ManifestTable.read(spark, root, schema).limit(0)
    val keep = prunedEntries(spark, root, schema, m, ranges)
    if (keep.isEmpty) ManifestTable.read(spark, root, schema).limit(0)
    else ManifestTable.reconciledEntriesRead(spark, root, schema, m, keep)
  }

  /** The entry subset that can hold rows inside every [lo, hi]
    * (inclusive; null = open side): a file drops when ANY column's
    * zone proves absence; uncovered files keep conservatively; the
    * [[ManifestTable.pruneAbsent]] guard keeps LSM delta reconcile
    * exact. The shared kernel of [[lookupRanges]] and the zone-hinted
    * DELETE discovery ([[ManifestTable.deleteWhere]]). */
  private[store] def prunedEntries(
      spark: SparkSession,
      root: String,
      schema: StructType,
      m: ManifestTable.Manifest,
      ranges: Seq[(String, Any, Any)]): Seq[ManifestTable.FileEntry] = {
    // hint-path short-circuit: a table without zone sidecars keeps
    // everything — one directory listing, no sidecar-frame planning
    // (hinted UPDATE/DELETE consult this on EVERY statement)
    if (ManifestTable.committedAdditiveDirs(spark, root, "zones").isEmpty)
      return m.entries
    val zoneRows = zonesOf(spark, root)
      .filter(col("column").isin(ranges.map(_._1): _*))
      .select("relPath", "column", "kind", "minS", "maxS", "nonNull")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3), r.getString(4), r.getBoolean(5)))
      .toMap // bounded by files x probed columns, tiny rows
    val rendered = ranges.map { case (c, lo, hi) =>
      val dt = schema(c).dataType
      (c, kindOf(dt), renderBound(spark, lo, dt), renderBound(spark, hi, dt))
    }
    def definitelyAbsent(rp: String): Boolean =
      rendered.exists { case (c, kind, loS, hiS) =>
        zoneRows.get((rp, c)).exists { case (k, mn, mx, nonNull) =>
          k == kind && (
            !nonNull || mn == null || mx == null ||
            loS.exists(l => cmp(k, mx, l) < 0) ||
            hiS.exists(h => cmp(k, mn, h) > 0))
        }
      }
    ManifestTable.pruneAbsent(m.entries, e => definitelyAbsent(e.relPath))
  }
}
