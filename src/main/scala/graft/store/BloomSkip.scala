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
    * per-file-per-column aggregate, one sidecar write. Returns the
    * number of (file, column) filters written (0 = already covered —
    * repeated calls are incremental no-ops). `expectedItems` sizes each
    * filter (default: the largest uncovered file's row count). */
  def buildBlooms(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String],
      fpp: Double = 0.03,
      expectedItems: Long = 0L): Int = {
    require(cols.nonEmpty, "need at least one column to bloom")
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in the schema"))
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty) return 0
    val covered = bloomsOf(spark, root)
      .select(col("relPath"), col("column")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val todo = m.entries.filter(e =>
      cols.exists(c => !covered((e.relPath, c))))
    if (todo.isEmpty) return 0
    val n =
      if (expectedItems > 0) expectedItems
      else math.max(1024L, todo.map(_.rows).max)
    // one scan over the uncovered files; per-file grouping via the
    // scan's own file names (absolute → relative suffix match driver-side
    // is avoided: keep the absolute path and strip the root prefix in
    // Spark, so renames of the root between build and read are moot)
    val paths = todo.map(e => s"$root/${e.relPath}")
    val byFile = spark.read.schema(schema).parquet(paths: _*)
      .withColumn("_file", input_file_name())
    val aggs = cols.map(c =>
      bloomAgg(xxhash64(col(c)), n, fpp).as(s"_b_$c"))
    val perFile = byFile.groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
    // unpivot to (file, column, bits); map absolute file → relPath by
    // suffix match against the manifest's own entries
    val pairs = perFile.collect().flatMap { r =>
      val f = r.getString(0)
      // Format-8 entries are FILE-granular: the scan's file path itself
      // carries the entry's relPath as a suffix. Legacy entries are
      // leaf DIRECTORIES: match the file's parent instead. Both via
      // exact "/"-anchored suffix so `_bucket=1` never claims
      // `_bucket=11`'s file.
      val parent = f.substring(0, math.max(0, f.lastIndexOf('/')))
      val rel = todo.map(_.relPath).find(rp =>
        f.endsWith("/" + rp) || parent.endsWith("/" + rp))
      rel.toSeq.flatMap(rp => cols.zipWithIndex.collect {
        case (c, i) if !covered((rp, c)) =>
          ((rp, c), r.getAs[Array[Byte]](i + 1))
      })
    }
    // an entry is a LEAF DIRECTORY: if a writer ever leaves several part
    // files in one, their filters must OR together — a duplicate row
    // winning arbitrarily would under-cover the file and turn "definitely
    // absent" into a false negative
    val rows = pairs.groupBy(_._1).map { case ((rp, c), vs) =>
      val merged = vs.map(v => BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(v._2)))
        .reduce { (a, b) => a.mergeInPlace(b); a }
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      org.apache.spark.sql.Row(rp, c, fpp, bos.toByteArray)
    }.toSeq
    if (rows.isEmpty) return 0
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("relPath",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("column",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("fpp",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("bits", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), outSchema)
    ManifestTable.writeBloomSidecar(spark, root, m, df)
    rows.length
  }

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
      values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "need at least one probe value")
    require(values.forall(_ != null),
      "= never matches NULL; probes must be non-NULL")
    val m = ManifestTable.currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no manifest table at $root"))
    if (m.entries.isEmpty)
      return ManifestTable.read(spark, root, schema).limit(0)
    // probe hashes through the SAME expression the build used, typed
    // to the declared column (one local query over all probes)
    val typed = values.map(v => lit(v).cast(schema(column).dataType))
    val hs = spark.range(1)
      .select(explode(array(typed.map(xxhash64(_)): _*)))
      .collect().map(_.getLong(0))
    // distributed membership test: only DEFINITELY-ABSENT paths cross
    // back to the driver (bounded by the file count, no filter bytes)
    val absent = bloomsOf(spark, root).filter(col("column") === column)
      .select(col("relPath"), col("bits")).as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.BINARY))
      .map { case (rp, bits) =>
        val bf = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bits))
        (rp, hs.exists(bf.mightContainLong))
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaBoolean))
      .filter(!col("_2")).select(col("_1")).collect()
      .map(_.getString(0)).toSet
    // bucket-granular skip: every live file covered AND absent
    val byBucket = m.entries.groupBy(_.bucket)
    val keep = byBucket.filter { case (_, es) =>
      !es.forall(e => absent(e.relPath))
    }.values.flatten.toSeq
    val base =
      if (keep.isEmpty) ManifestTable.read(spark, root, schema).limit(0)
      else ManifestTable.reconciledEntriesRead(spark, root, schema, m,
        keep)
    base.filter(col(column).isin(typed: _*))
  }
}
