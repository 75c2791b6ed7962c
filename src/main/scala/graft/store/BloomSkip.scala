package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE column Bloom filters for the manifest table: zero-maintenance
  * probabilistic FILE SKIPPING on non-key columns — the lakehouse
  * complement to [[SecondaryIndex]] (exact, but a maintained second
  * table). A point predicate on a bloomed column reads only the buckets
  * whose filters say "maybe" (plus any file not yet covered), instead of
  * scanning the table.
  *
  * STORAGE: a `bloom/v<version>-<attempt>[-r<rev>]` parquet sidecar per
  * build — rows of (relPath, column, expected fpp, serialized filter) —
  * resolved through the same committed-side-dir rules as history/stats
  * (`_SUCCESS`-marked, attempt must match the version's committed
  * `sideId`, vacuum GC applies). Data files are IMMUTABLE, so a file's
  * filter never goes stale; a build covers exactly the current files
  * that no committed sidecar covers yet, and repeated builds are
  * incremental by construction. Readers union all sidecars and keep the
  * newest row per (file, column).
  *
  * PRUNING IS BUCKET-GRANULAR, not file-granular, and that is a
  * correctness requirement, not a simplification: with LSM delta files a
  * bucket's rows reconcile last-seq-wins per key, so dropping ONE file
  * of a bucket can resurrect a row a later delta overrode (the override
  * row need not match the probed value — only its victim did). A bucket
  * is skipped iff EVERY live file in it is covered by a filter and every
  * filter says "definitely absent"; otherwise the whole bucket reads and
  * reconciles exactly as a normal scan.
  *
  * HASH DISCIPLINE: filters hold `xxhash64` of the column's NATIVE type,
  * computed BY SPARK at build time, and the probe hashes through the
  * same expression over a literal cast to the column's declared type —
  * the [[ManifestTable.lookup]] normalization discipline, so build and
  * probe can never disagree on a representation. */
object BloomSkip {

  /** Catalyst aggregate: xxhash64-long inputs → one serialized
    * `org.apache.spark.util.sketch.BloomFilter` per group. Buffers
    * created with identical (n, fpp) so partial merges are compatible. */
  private[store] case class BloomAgg(
      child: Expression,
      expectedItems: Long,
      fpp: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter]
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(b: BloomFilter, in: InternalRow): BloomFilter = {
      val v = child.eval(in)
      if (v != null) b.putLong(v.asInstanceOf[Long])
      b
    }

    override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
      b.mergeInPlace(o); b
    }

    override def eval(b: BloomFilter): Any = serialize(b)

    override def serialize(b: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bloom_agg"
    override protected def withNewChildInternal(c: Expression): BloomAgg =
      copy(child = c)
    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
  }

  private def bloomAgg(c: org.apache.spark.sql.Column, n: Long,
      fpp: Double): org.apache.spark.sql.Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(BloomAgg(B.expression(c), n, fpp).toAggregateExpression())
  }

  /** Catalyst aggregate: serialized-filter BINARY inputs → their OR
    * (`mergeInPlace`). The second, cheap pass of the distributed build:
    * when a legacy leaf-dir entry holds several part files, their
    * per-file filters must OR together — a duplicate row winning
    * arbitrarily would under-cover the file and turn "definitely
    * absent" into a false negative. Buffers use the same (n, fpp) as
    * the build's [[BloomAgg]], so bit widths are merge-compatible. */
  private[store] case class BloomMergeAgg(
      child: Expression,
      expectedItems: Long,
      fpp: Double,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter]
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(b: BloomFilter, in: InternalRow): BloomFilter = {
      child.eval(in) match {
        case null => b
        case bytes: Array[Byte] =>
          b.mergeInPlace(BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes)))
          b
      }
    }

    override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
      b.mergeInPlace(o); b
    }

    override def eval(b: BloomFilter): Any = serialize(b)

    override def serialize(b: BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      b.writeTo(bos)
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "bloom_merge_agg"
    override protected def withNewChildInternal(c: Expression): BloomMergeAgg =
      copy(child = c)
    override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
      copy(inputAggBufferOffset = o)
  }

  private def bloomMergeAgg(c: org.apache.spark.sql.Column, n: Long,
      fpp: Double): org.apache.spark.sql.Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(BloomMergeAgg(B.expression(c), n, fpp).toAggregateExpression())
  }

  /** All committed bloom rows: (relPath, column, bits), newest sidecar
    * winning per (file, column). Lazy frame; empty when no sidecar. */
  def bloomsOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = ManifestTable.committedBloomDirs(spark, root)
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("relPath",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("column",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("bits", BinaryType))))
    else {
      val all = dirs.zipWithIndex.map { case (d, i) =>
        spark.read.parquet(d).withColumn("_ord", lit(i))
      }.reduce(_ unionByName _)
      all.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("relPath"), col("column"))
            .orderBy(col("_ord").desc)))
        .filter(col("_rn") === 1)
        .select(col("relPath"), col("column"), col("bits"))
    }
  }

  /** Builds filters for every (current file, column) pair no committed
    * sidecar covers yet: ONE scan of the uncovered files, one
    * per-file-per-column aggregate, one per-entry OR-merge, one sidecar
    * write — ALL DISTRIBUTED. No filter bytes ever cross the driver: at
    * production sizes (~1 MB filter per 1-2 M-row file, 400k files) a
    * bootstrap build is hundreds of GB of filters, which flow scan →
    * shuffle → sidecar parquet entirely executor-side; the driver
    * handles only entry metadata (the same class of object as the
    * manifest itself). Returns the number of (file, column) filters
    * written (0 = already covered — repeated calls are incremental
    * no-ops). `expectedItems` sizes each filter (default: the largest
    * uncovered file's row count).
    *
    * Each call also refreshes the SUMMARY level ([[summariesOf]]): one
    * coarse per-(bucket, column) filter at `summaryFpp`, rebuilt for
    * exactly the buckets whose recorded file coverage no longer equals
    * their live file set (merge-touched buckets — cost ∝ churn, like
    * the per-file level). Lookups probe summaries FIRST and read only
    * the surviving buckets' per-file filter rows: at fleet scale the
    * summary level is ln(1/summaryFpp)/ln(1/fpp) the per-file bytes
    * (~1/3 at the defaults) and small enough to pin in memory across
    * lookups, after which a point probe touches per-file bytes for the
    * few "maybe" buckets only. */
  def buildBlooms(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String],
      fpp: Double = 0.03,
      expectedItems: Long = 0L,
      summaryFpp: Double = 0.25): Int = {
    val written = planBuild(spark, root, schema, cols, fpp,
        expectedItems) match {
      case None => 0
      case Some((sidecar, m)) =>
        val dir = ManifestTable.writeBloomSidecar(spark, root, m, sidecar)
        // written-count from the sidecar's own parquet footers: one
        // metadata-only count, no recompute, no driver-side rows
        spark.read.parquet(dir).count().toInt
    }
    planSummaryBuild(spark, root, schema, cols, summaryFpp).foreach {
      case (sidecar, m) =>
        ManifestTable.writeAdditiveSidecar(spark, root, m, sidecar,
          "bloomsum", singleFile = false)
    }
    written
  }

  /** All committed summary rows: (bucket, column, covers, bits), newest
    * winning per (bucket, column). A summary is only USABLE for a
    * bucket while `covers` still equals the bucket's live file set —
    * a merge-rewritten bucket's rows are not in the old summary, and
    * trusting it would turn "definitely absent" into a false negative;
    * [[buildBlooms]] rebuilds exactly the stale ones. */
  def summariesOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = ManifestTable.committedBloomSummaryDirs(spark, root)
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("column",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("covers",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StringType)),
          org.apache.spark.sql.types.StructField("bits", BinaryType))))
    else {
      val all = dirs.zipWithIndex.map { case (d, i) =>
        spark.read.parquet(d).withColumn("_ord", lit(i))
      }.reduce(_ unionByName _)
      all.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("bucket"), col("column"))
            .orderBy(col("_ord").desc)))
        .filter(col("_rn") === 1)
        .select(col("bucket"), col("column"), col("covers"), col("bits"))
    }
  }

  /** The summary-level build plan: rebuilds the (bucket, column)
    * summaries whose recorded coverage drifted from the live file set.
    * One scan over the stale buckets' files, one per-bucket aggregate
    * — the per-file build's distributed shape one level up. */
  private[graft] def planSummaryBuild(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String],
      summaryFpp: Double): Option[(DataFrame, ManifestTable.Manifest)] = {
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty) return None
    val liveByBucket: Map[Int, Set[String]] =
      m.entries.groupBy(_.bucket).view
        .mapValues(_.map(_.relPath).toSet).toMap
    val current = summariesOf(spark, root)
      .select(col("bucket"), col("column"), col("covers")).collect()
      .map(r => ((r.getInt(0), r.getString(1)),
        r.getSeq[String](2).toSet)).toMap
    // shallow-clone buckets (any ext file) never summary-build: the
    // bucket resolver below cannot key ext files, so a summary
    // claiming the bucket's full live set would UNDER-cover and
    // wrongly prune — exclude those buckets outright (no summary =
    // no pruning = conservative)
    val extBuckets =
      m.entries.filter(ManifestTable.isExt).map(_.bucket).toSet
    val stale: Seq[(Int, String)] = (for {
      b <- liveByBucket.keys if !extBuckets(b)
      c <- cols
      if !current.get((b, c)).contains(liveByBucket(b))
    } yield (b, c)).toSeq
    if (stale.isEmpty) return None
    val staleBuckets = stale.map(_._1).toSet
    val entries = m.entries.filter(e => staleBuckets(e.bucket))
    val n = math.max(1024L,
      entries.groupBy(_.bucket).values.map(_.map(_.rows).sum).max)
    val staleCols = stale.map(_._2).distinct
    // one scan over the stale buckets' files; rows map to their bucket
    // through the entry list (broadcast, O(1) per FILE via the same
    // resolver the per-file build uses — evaluated on per-file rows
    // only after the aggregate? No: bucket grouping needs the bucket
    // per data row, so resolve on the scan, still O(1) per row)
    val rootPath = {
      val rp = new Path(root)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.makeQualified(rp).toUri.getPath
    }
    val bucketOfRel = entries.map(e => e.relPath -> e.bucket).toMap
    val relsB = spark.sparkContext.broadcast(bucketOfRel)
    val resolveBucket = udf { f: String =>
      val resolved: Option[Int] =
        if (f == null) None
        else {
          val p = new Path(f).toUri.getPath
          if (!p.startsWith(rootPath + "/")) None
          else {
            val rel = p.substring(rootPath.length + 1)
            relsB.value.get(rel).orElse {
              val cut = rel.lastIndexOf('/')
              val parent = if (cut <= 0) "" else rel.substring(0, cut)
              relsB.value.get(parent)
            }
          }
        }
      resolved.map(Integer.valueOf).orNull
    }
    // column mapping: files store PHYSICAL names — read under them,
    // alias back to the logical names the sidecar records
    val byBucketRaw = spark.read
      .schema(ManifestTable.toPhysicalSchema(m, schema))
      .parquet(entries.map(e => ManifestTable.dataPath(root, e)): _*)
      .withColumn("_bkt", resolveBucket(input_file_name()))
      .filter(col("_bkt").isNotNull)
    val byBucket =
      if (m.colMap.isEmpty) byBucketRaw
      else byBucketRaw.select((schema.fieldNames.toSeq.map(nm =>
        col(ManifestTable.physicalOf(m, nm)).as(nm)) :+ col("_bkt")): _*)
    val aggs = staleCols.map(c =>
      bloomAgg(xxhash64(col(c)), n, summaryFpp).as(s"_s_$c"))
    val coversB = spark.sparkContext.broadcast(
      liveByBucket.view.mapValues(_.toSeq.sorted).toMap)
    val coversOf = udf { b: Int => coversB.value(b) }
    val staleSet = stale.toSet
    val isStale = udf { (b: Int, c: String) => staleSet((b, c)) }
    val sidecar = byBucket.groupBy(col("_bkt"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_bkt").as("bucket"), explode(array(staleCols.map(c =>
        struct(lit(c).as("column"), col(s"_s_$c").as("bits"))): _*))
        .as("kv"))
      .filter(isStale(col("bucket"), col("kv.column")))
      .select(col("bucket"), col("kv.column").as("column"),
        lit(summaryFpp).as("fpp"), coversOf(col("bucket")).as("covers"),
        col("kv.bits").as("bits"))
    Some((sidecar, m))
  }

  /** The distributed build plan: `Some((sidecarFrame, manifest))` when
    * uncovered (file, column) pairs exist. Exposed (package-private)
    * so specs can assert the WRITE INPUT is the distributed pipeline —
    * scan → per-file bloom_agg → per-entry bloom_merge_agg — and not a
    * re-parallelized driver collection (no LocalTableScan). */
  private[graft] def planBuild(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String],
      fpp: Double = 0.03,
      expectedItems: Long = 0L): Option[(DataFrame, ManifestTable.Manifest)] = {
    require(cols.nonEmpty, "need at least one column to bloom")
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in the schema"))
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty) return None
    val covered = bloomsOf(spark, root)
      .select(col("relPath"), col("column")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // shallow-clone ext entries never build (the file→relPath match
    // cannot key them); they simply stay uncovered — conservative
    val todo = m.entries.filter(e => !ManifestTable.isExt(e) &&
      cols.exists(c => !covered((e.relPath, c))))
    if (todo.isEmpty) return None
    val n =
      if (expectedItems > 0) expectedItems
      else math.max(1024L, todo.map(_.rows).max)
    // one scan over the uncovered files; per-file grouping via the
    // scan's own file names
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
    val aggs = cols.map(c =>
      bloomAgg(xxhash64(col(c)), n, fpp).as(s"_b_$c"))
    val perFile = byFile.groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
    // absolute file → entry relPath INSIDE the query (runs on the
    // per-file aggregate — one row per file, not per data row). The
    // uncovered entry list broadcasts; the match is O(1) per row:
    // strip the qualified root prefix, then the suffix either IS a
    // format-8 file entry's relPath or its parent is a legacy leaf-dir
    // entry's. "/"-anchored so `_bucket=1` never claims `_bucket=11`.
    val rootPath = {
      val rp = new Path(root)
      val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.makeQualified(rp).toUri.getPath
    }
    val relsB = spark.sparkContext.broadcast(todo.map(_.relPath).toSet)
    val resolveRel = udf { f: String =>
      if (f == null) null
      else {
        val p = new Path(f).toUri.getPath
        if (!p.startsWith(rootPath + "/")) null
        else {
          val rel = p.substring(rootPath.length + 1)
          if (relsB.value(rel)) rel
          else {
            val cut = rel.lastIndexOf('/')
            val parent = if (cut <= 0) "" else rel.substring(0, cut)
            if (parent.nonEmpty && relsB.value(parent)) parent else null
          }
        }
      }
    }
    // unpivot to (relPath, column, bits), drop already-covered pairs
    // (an entry lands in `todo` when ANY requested column is uncovered)
    // via an anti-join against the committed rows — still no driver
    // materialization of filter bytes
    val unpivoted = perFile
      .withColumn("_rel", resolveRel(col("_file")))
      .filter(col("_rel").isNotNull)
      .select(col("_rel").as("relPath"), explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(s"_b_$c").as("bits"))): _*))
        .as("kv"))
      .select(col("relPath"), col("kv.column").as("column"),
        col("kv.bits").as("bits"))
      .join(bloomsOf(spark, root).select("relPath", "column"),
        Seq("relPath", "column"), "left_anti")
    // per-entry OR-merge (legacy multi-part-file leaf dirs), then the
    // sidecar frame in its storage schema
    val sidecar = unpivoted
      .groupBy(col("relPath"), col("column"))
      .agg(bloomMergeAgg(col("bits"), n, fpp).as("bits"))
      .select(col("relPath"), col("column"), lit(fpp).as("fpp"),
        col("bits"))
    Some((sidecar, m))
  }

  /** Test seam for [[BloomMergeAgg]]: OR-merges `bits` per `relPath`. */
  private[graft] def mergeForTest(
      df: DataFrame, n: Long, fpp: Double): DataFrame =
    df.groupBy(col("relPath"))
      .agg(bloomMergeAgg(col("bits"), n, fpp).as("bits"))

  /** Point read on a bloomed (non-key) column: reads only the buckets
    * whose every-file filters cannot rule the value out. Exact results
    * at any reconciliation state — a bucket skips only when ALL its
    * live files are covered and ALL say "definitely absent". The probe
    * must be non-NULL (standard `=` semantics). */
  def lookupByColumn(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      column: String,
      value: Any): DataFrame =
    lookupByColumnIn(spark, root, schema, column, Seq(value))

  /** IN-list variant of [[lookupByColumn]]: one pass over the filters
    * answers every probe (a file survives if ANY probe might be
    * present), one bucket-pruned read serves the whole list. */
  def lookupByColumnIn(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      column: String,
      values: Seq[Any]): DataFrame =
    lookupDiagnosed(spark, root, schema, column, values)._1

  /** Lookup probe evidence for specs: (buckets the SUMMARY level ruled
    * out before any per-file filter row was touched, per-file rows the
    * second level actually deserialized). */
  private[graft] case class ProbeStats(
      summaryPruned: Set[Int], fileFiltersRead: Long)

  /** [[lookupByColumnIn]] plus its [[ProbeStats]] — the two-level read
    * path itself, instrumented. */
  private[graft] def lookupDiagnosed(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      column: String,
      values: Seq[Any]): (DataFrame, ProbeStats) = {
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty)
      return (ManifestTable.read(spark, root, schema).limit(0),
        ProbeStats(Set.empty, 0L))
    val (keep, stats) =
      prunedEntriesFor(spark, root, schema, m, column, values)
    val typed = values.map(v => lit(v).cast(schema(column).dataType))
    val base =
      if (keep.isEmpty) ManifestTable.read(spark, root, schema).limit(0)
      else ManifestTable.reconciledEntriesRead(spark, root, schema, m,
        keep)
    (base.filter(col(column).isin(typed: _*)), stats)
  }

  /** The entry subset the bloom sidecars cannot rule out for `column IN
    * values` — the two-level keep-set kernel of [[lookupDiagnosed]],
    * shared with the equality-probe DELETE/UPDATE discovery hint
    * ([[ManifestTable.deleteWhere]]). Uncovered buckets/files keep
    * conservatively; [[ManifestTable.pruneAbsent]] keeps LSM delta
    * reconcile exact. */
  private[graft] def prunedEntriesFor(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      m: ManifestTable.Manifest,
      column: String,
      values: Seq[Any]): (Seq[ManifestTable.FileEntry], ProbeStats) = {
    require(values.nonEmpty, "need at least one probe value")
    require(values.forall(_ != null),
      "= never matches NULL; probes must be non-NULL")
    // hint-path short-circuit: no bloom sidecars -> keep everything
    // (hinted UPDATE/DELETE consult this on EVERY equality statement)
    if (ManifestTable.committedAdditiveDirs(spark, root, "bloom").isEmpty)
      return (m.entries, ProbeStats(Set.empty, 0L))
    // probe hashes through the SAME expression the build used, typed
    // to the declared column (one local query over all probes)
    val typed = values.map(v => lit(v).cast(schema(column).dataType))
    val hs = spark.range(1)
      .select(explode(array(typed.map(xxhash64(_)): _*)))
      .collect().map(_.getLong(0))

    // LEVEL 1 — per-bucket summaries: a bucket whose (usable) summary
    // says "definitely absent" is dropped before any per-file filter
    // row is touched. Usable = the summary still covers exactly the
    // bucket's live files (a merge-rewritten bucket's new rows are not
    // in the old summary — trusting it would be a false negative).
    val liveByBucket: Map[Int, Set[String]] =
      m.entries.groupBy(_.bucket).view
        .mapValues(_.map(_.relPath).toSet).toMap
    val liveB = spark.sparkContext.broadcast(liveByBucket)
    val summaryPruned: Set[Int] = summariesOf(spark, root)
      .filter(col("column") === column)
      .select(col("bucket"), col("covers"), col("bits"))
      .as(org.apache.spark.sql.Encoders
        .product[(Int, Seq[String], Array[Byte])])
      .map { case (b, covers, bits) =>
        val usable = liveB.value.get(b).contains(covers.toSet)
        val maybe = usable && {
          val bf = BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bits))
          hs.exists(bf.mightContainLong)
        }
        // prune iff usable and every probe definitely absent
        (b, usable && !maybe)
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaBoolean))
      .filter(col("_2")).select(col("_1")).collect()
      .map(_.getInt(0)).toSet
    val surviving = m.entries.filterNot(e => summaryPruned(e.bucket))
    if (surviving.isEmpty)
      return (Nil, ProbeStats(summaryPruned, 0L))

    // LEVEL 2 — per-file filters, read ONLY for the surviving buckets'
    // files: the isin pushes into the sidecar parquet scan, so pruned
    // buckets' filter bytes stay in storage. Only DEFINITELY-ABSENT
    // paths cross back to the driver (bounded by the file count).
    val survivingPaths = surviving.map(_.relPath)
    val read = spark.sparkContext.longAccumulator("bloomFileFiltersRead")
    val absent = bloomsOf(spark, root)
      .filter(col("column") === column &&
        col("relPath").isin(survivingPaths: _*))
      .select(col("relPath"), col("bits")).as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.BINARY))
      .map { case (rp, bits) =>
        read.add(1L)
        val bf = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bits))
        (rp, hs.exists(bf.mightContainLong))
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaBoolean))
      .filter(!col("_2")).select(col("_1")).collect()
      .map(_.getString(0)).toSet
    // bucket-granular in general (every live file covered AND absent);
    // FILE-granular on single-seq buckets (clusterBy'd layouts) — see
    // ManifestTable.pruneAbsent
    val keep = ManifestTable.pruneAbsent(surviving,
      e => absent(e.relPath))
    (keep, ProbeStats(summaryPruned, read.value))
  }
}
