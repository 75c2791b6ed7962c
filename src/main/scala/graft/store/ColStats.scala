package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** INCREMENTAL COLUMN STATISTICS (the ANALYZE face), built with the
  * zones/bloom sidecar discipline: per-FILE stats rows — row count,
  * null count, and a mergeable Apache DataSketches HLL sketch of the
  * column's distinct values — in an additive `colstats` sidecar.
  * Because the unit is the immutable FILE, ANALYZE cost rides the
  * CHANGE RATE: covered files never rescan, a commit's rewritten
  * buckets are the only new work, and table-level stats are a
  * metadata-only fold (counts sum; sketches `hll_union_agg` — union
  * is exact over sketches, so the table NDV estimate is the same as
  * if one sketch had seen every row). At 100 TB a weekly full
  * ANALYZE is a non-starter; per-file sketches make stats a
  * maintained byproduct of writing.
  *
  * Accuracy contract: row/null counts are exact PER FILE; on a
  * single-seq (compacted/clustered) table the table fold is exact
  * row/null counts too, while un-compacted delta chains overcount
  * superseded rows (file-level stats cannot know which rows a higher
  * tier kills) — [[tableStats]] reports `single_seq` so a consumer
  * can tell. NDV is the standard HLL estimate (~2% at lgK 12).
  * Shallow-clone `ext:` files are skipped by the builder (their
  * bytes belong to another table); coverage is reported, never
  * assumed. */
object ColStats {
  import ManifestTable.{FileEntry, Manifest}

  private val statsSchema = StructType(Seq(
    StructField("relPath", StringType),
    StructField("column", StringType),
    StructField("rows", LongType),
    StructField("nulls", LongType),
    StructField("sketch", BinaryType)))

  /** All committed per-file stats rows (newest revision wins is not
    * needed — rows are additive per (relPath, column); readers filter
    * to live files). */
  def statsOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = ManifestTable.committedAdditiveDirs(spark, root,
      "colstats")
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        statsSchema)
    else spark.read.schema(statsSchema).parquet(dirs: _*)
  }

  /** Builds stats for every LIVE file not yet covered for every
    * requested column — one scan over exactly those files. Returns the
    * number of (file, column) stat rows written (0 = fully covered:
    * the incremental no-op). */
  def buildStats(
      spark: SparkSession,
      root: String,
      schema: StructType,
      cols0: Seq[String]): Int = {
    val cols = cols0.distinct // duplicate names would collide agg aliases
    require(cols.nonEmpty, "no columns to analyze")
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in the schema"))
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty) return 0
    val covered = statsOf(spark, root)
      .select(col("relPath"), col("column")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // ext (shallow-clone) files never build: the file→relPath suffix
    // match cannot key them — they stay visibly uncovered instead
    val todo = m.entries.filter(e => !ManifestTable.isExt(e) &&
      cols.exists(c => !covered((e.relPath, c))))
    if (todo.isEmpty) return 0
    val paths = todo.map(e => ManifestTable.dataPath(root, e))
    // column mapping: read under the files' PHYSICAL names, alias
    // back to logical (what the sidecar records)
    val byFileRaw = spark.read
      .schema(ManifestTable.toPhysicalSchema(m, schema))
      .parquet(paths: _*)
      .withColumn("_file", input_file_name())
    val byFile =
      if (m.colMap.isEmpty) byFileRaw
      else byFileRaw.select((schema.fieldNames.toSeq.map(nm =>
        col(ManifestTable.physicalOf(m, nm)).as(nm)) :+
        col("_file")): _*)
    val aggs = cols.flatMap { c =>
      // HLL over the column rendered as string: one sketch domain for
      // every type (the estimate is domain-agnostic; NULLs dropped)
      Seq(count(lit(1)).as(s"_rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        hll_sketch_agg(col(c).cast(StringType)).as(s"_hll_$c"))
    }
    val perFile = byFile.groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    // absolute file → relPath by "/"-anchored suffix (format-8 file
    // entries; legacy leaf-dir entries match on the parent) — the
    // ZoneSkip/BloomSkip discipline
    val rows = perFile.flatMap { r =>
      val f = r.getString(0)
      val parent = f.substring(0, math.max(0, f.lastIndexOf('/')))
      val rel = todo.map(_.relPath).find(rp =>
        f.endsWith("/" + rp) || parent.endsWith("/" + rp))
      rel.toSeq.flatMap(rp => cols.zipWithIndex.collect {
        case (c, i) if !covered((rp, c)) =>
          org.apache.spark.sql.Row(rp, c,
            r.getLong(1 + 3 * i), r.getLong(2 + 3 * i),
            r.get(3 + 3 * i))
      })
    }.toSeq
    if (rows.isEmpty) return 0
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), statsSchema)
    ManifestTable.writeAdditiveSidecar(spark, root, m, df, "colstats")
    rows.size
  }

  /** Table-level stats fold over the LIVE covered files — metadata
    * only, no data read. One row per column: exact row/null sums over
    * covered files, the HLL-union NDV estimate, and the coverage
    * facts a consumer needs to judge them (`covered_files` vs
    * `live_files`; `single_seq` = no delta chains, so the sums are
    * exact table counts). */
  def tableStats(
      spark: SparkSession,
      root: String,
      cols: Seq[String]): DataFrame = {
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    val live = m.entries.map(_.relPath).toSet
    val liveCount = live.size.toLong
    val singleSeq = m.entries.groupBy(_.bucket).values
      .forall(es => es.map(_.seq).distinct.size == 1 &&
        !es.exists(_.tomb))
    import spark.implicits._
    val liveDf = live.toSeq.toDF("relPath")
    statsOf(spark, root)
      .join(broadcast(liveDf), "relPath")
      .filter(col("column").isInCollection(cols))
      // RACING builders can each append rows for the same new files
      // (both read "uncovered" before either committed its sidecar) —
      // the sidecar is additive with no (relPath, column) key, so the
      // fold must dedup or it SUMS duplicates: doubled row/null counts,
      // covered_files above live_files, corrupt stats fed to the CBO.
      // Any copy is a valid measurement of the same immutable file, so
      // keep-one is exact (zones/bloom fold through last-wins maps for
      // the same reason).
      .dropDuplicates("relPath", "column")
      .groupBy(col("column"))
      .agg(sum("rows").as("row_count"),
        sum("nulls").as("null_count"),
        ceil(hll_sketch_estimate(hll_union_agg(col("sketch"))))
          .as("ndv"),
        count(lit(1)).as("covered_files"))
      .withColumn("live_files", lit(liveCount))
      .withColumn("single_seq", lit(singleSeq))
  }

  /** ANALYZE: incremental build + the table fold in one call. */
  def analyze(
      spark: SparkSession,
      root: String,
      schema: StructType,
      cols: Seq[String]): DataFrame = {
    buildStats(spark, root, schema, cols)
    tableStats(spark, root, cols)
  }

  /** One column's folded live stats: exact row/null sums and the
    * HLL-union NDV estimate over the files covered. `full` = every
    * live file is covered AND the table is single-seq, i.e. the sums
    * are exact table counts a planner may trust. */
  final case class Live(rows: Long, nulls: Long, ndv: Long,
      full: Boolean)

  /** DRIVER-SIDE stats fold for PLANNING consumers
    * ([[GraftBatchScan.estimateStatistics]]'s columnStats): the same
    * fold as [[tableStats]] but with the sketch union done on the
    * driver (org.apache.datasketches directly — Spark's
    * `hll_sketch_agg` writes DataSketches HLL bytes), so asking for
    * stats at plan time costs one tiny sidecar collect (a few rows per
    * file×column) and no shuffle. Returns only columns with at least
    * one covered live file; planners gate on `full`. */
  def liveStats(
      spark: SparkSession,
      root: String,
      m: Manifest): Map[String, Live] = {
    // never-analyzed tables pay ONE fs.exists here — the planning
    // path must not fund a manifest head re-read for absent stats
    val dir = new org.apache.hadoop.fs.Path(s"$root/colstats")
    if (!dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(dir)) return Map.empty
    val dirs = ManifestTable.committedAdditiveDirs(spark, root,
      "colstats")
    if (dirs.isEmpty) return Map.empty
    val live = m.entries.map(_.relPath).toSet
    val singleSeq = m.entries.groupBy(_.bucket).values
      .forall(es => es.map(_.seq).distinct.size == 1 &&
        !es.exists(_.tomb))
    val rows = spark.read.schema(statsSchema).parquet(dirs: _*)
      .collect()
      .filter(r => live(r.getString(0)))
    rows.groupBy(_.getString(1)).map { case (c, rs) =>
      val u = new org.apache.datasketches.hll.Union(12)
      var nRows = 0L; var nNulls = 0L
      val covered = scala.collection.mutable.HashSet.empty[String]
      rs.foreach { r =>
        // keep-FIRST per file: racing builders may have appended
        // duplicate rows for the same (file, column) — summing them
        // doubles the counts while `full` still reads true (the
        // tableStats dropDuplicates, driver-fold flavor)
        if (covered.add(r.getString(0))) {
          nRows += r.getLong(2); nNulls += r.getLong(3)
          val sk = r.getAs[Array[Byte]](4)
          if (sk != null && sk.nonEmpty)
            u.update(org.apache.datasketches.hll.HllSketch.heapify(sk))
        }
      }
      c -> Live(nRows, nNulls,
        math.ceil(u.getResult.getEstimate).toLong,
        full = singleSeq && covered.size == live.size)
    }
  }
}
