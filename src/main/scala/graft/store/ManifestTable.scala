package graft.store

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.mapping.Mapping
import graft.operators.{CreateAndUpdate, ImportMode, Upsert}

/** Hand-rolled parquet-manifest table format: the incremental MERGE sink
  * for continuous and batch imports.
  *
  * The reference commits row-at-a-time through an ORM session
  * (importtask.py:369-371) — incremental by construction but serial. The
  * earlier Spark sink here was the opposite: atomic and parallel, but it
  * rewrote the ENTIRE merged target as a new version every micro-batch;
  * at 100 TB a 1,000-row batch would rewrite 100 TB. This format makes the
  * write cost proportional to the TOUCHED DATA, not the table:
  *
  *   root/
  *     data/v<version>/_bucket=<k>/part-*.parquet   (immutable once written)
  *     manifest/m<version>                          (atomically renamed file)
  *
  * Rows are hash-bucketed on the NORMALIZED upsert key
  * (`pmod(hash(norm(key)), numBuckets)`). A manifest is a small text file
  * listing, per live bucket: the data directory holding it, its row count
  * and its key range (min/max as strings — diagnostics plus reader-side
  * pruning for orderable keys; parquet footers already give columnar
  * min/max per row group). A MERGE:
  *
  *   1. computes the batch's touched buckets (≤ numBuckets values — a
  *      bounded aggregate, never a key collect),
  *   2. reads ONLY the files of touched buckets as the target fragment,
  *   3. runs the standard one-join [[graft.operators.Upsert]] of fragment
  *      vs batch,
  *   4. writes the merged touched buckets under `data/v<version>`,
  *   5. publishes manifest <version> = untouched entries (verbatim — their
  *      files are never rewritten, never even read) + rewritten entries,
  *      via temp-write + atomic rename.
  *
  * Readers resolve the highest committed manifest and union its files:
  * they never see a half-merged state. Each merge carries a
  * (streamId, batchId) idempotency token recorded in the manifest as
  * `lastBatch`; re-delivery of the last committed batch is a no-op,
  * making at-least-once foreachBatch delivery exactly-once. Table
  * versions are internal (`current + 1`). A crash between the data write
  * and the manifest rename leaves an orphan data directory that no
  * manifest references — invisible, and overwritten by the replay.
  *
  * Filesystems are resolved from the paths they operate on (never the
  * default FS). The manifest rename is the single commit point; rename
  * atomicity holds on HDFS/ABFS but NOT raw S3 — there, front the
  * manifest directory with a consistent store. Single-writer assumed
  * (Structured Streaming guarantees one foreachBatch at a time per query).
  *
  * At scale: `numBuckets` bounds the merge's write amplification — a
  * micro-batch touching k distinct buckets rewrites k/numBuckets of the
  * table at most, and the untouched fraction costs zero I/O. Pick
  * numBuckets so a bucket ≈ a comfortable file size (e.g. 100 TB / 256 MB
  * ≈ 400k buckets); the manifest stays a few MB of text.
  */
object ManifestTable {

  /** One live bucket in a committed manifest. `relPath` is relative to the
    * table root and points at a `_bucket=<k>` leaf directory. Key stats are
    * min/max of the NORMALIZED key rendered as a string (the same
    * `keyComparator` space the bucket hash uses), so comparator-aware
    * lookups can prune against them. */
  final case class FileEntry(
      bucket: Int, rows: Long, minKey: String, maxKey: String,
      relPath: String)

  /** `version` is the table's own monotone commit counter (internal —
    * callers never choose it). Replay detection is separate:
    * `lastBatch` is the (streamId, batchId) token of the last merge and
    * `lastDelete` the token of the last delete, so a replayed foreachBatch
    * delivery no-ops without colliding with table versions (a
    * `create()`-bootstrapped table starts at version 0 with NO lastBatch,
    * so the stream's batch 0 still applies). */
  final case class Manifest(
      version: Long, numBuckets: Int, entries: Seq[FileEntry],
      lastBatch: Option[(String, Long)] = None,
      lastDelete: Option[Long] = None)

  private val BucketCol = "_bucket"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** Highest committed manifest version, if any. Commit = the renamed
    * `m<version>` file exists; there is no torn state to filter because
    * the rename is the atomic commit point. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(s"$root/manifest")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter { n =>
          val s = n.stripPrefix("m")
          n.startsWith("m") && s.nonEmpty && s.forall(_.isDigit)
        }
        .map(_.stripPrefix("m").toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Parses a committed manifest. Line 1: `graft-manifest <format>`,
    * line 2: `numBuckets \t lastBatchStream \t lastBatchId \t lastDelete`
    * (empty id fields = none), then one tab-separated entry per bucket
    * with URL-encoded key stats (keys may contain tabs/newlines). */
  def readManifest(spark: SparkSession, root: String, version: Long): Manifest = {
    val p = new Path(s"$root/manifest/m$version")
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    // Format 1 (numBuckets only, no tokens) stays READABLE so tables
    // committed by the earlier code aren't bricked by the upgrade;
    // writes always produce format 2.
    require(lines.head == "graft-manifest 2" ||
      lines.head == "graft-manifest 1",
      s"unsupported manifest header: ${lines.head}")
    val h = lines(1).split("\t", -1)
    val numBuckets = h(0).toInt
    val lastBatch =
      if (h.length < 3 || h(2).isEmpty) None
      else Some((dec(h(1)), h(2).toLong))
    val lastDelete =
      if (h.length < 4 || h(3).isEmpty) None else Some(h(3).toLong)
    val entries = lines.drop(2).map { l =>
      val f = l.split("\t", -1)
      FileEntry(f(0).toInt, f(1).toLong, dec(f(2)), dec(f(3)), f(4))
    }
    Manifest(version, numBuckets, entries, lastBatch, lastDelete)
  }

  def currentManifest(spark: SparkSession, root: String): Option[Manifest] =
    currentVersion(spark, root).map(readManifest(spark, root, _))

  /** The committed table state (empty frame with `schema` when none). */
  def read(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    readManifestState(spark, root, schema, currentManifest(spark, root))

  /** TIME TRAVEL: the table as of committed version `version` — data
    * directories are immutable and every manifest survives until
    * `vacuum`, so any retained snapshot reads with zero extra storage
    * cost (the lakehouse read side of this format). Throws if `version`
    * was never committed or has been vacuumed. */
  def readAt(spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      version: Long): DataFrame = {
    val p = new Path(s"$root/manifest/m$version")
    require(fsOf(spark, p).exists(p),
      s"no committed manifest m$version under $root (vacuumed?)")
    readManifestState(spark, root, schema,
      Some(readManifest(spark, root, version)))
  }

  /** All committed snapshots, oldest first: (version, numBuckets,
    * rows) — the bounded metadata listing for `readAt` callers. */
  def versions(spark: SparkSession, root: String): Seq[(Long, Int, Long)] = {
    val dir = new Path(s"$root/manifest")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter { n =>
        val v = n.stripPrefix("m")
        n.startsWith("m") && v.nonEmpty && v.forall(_.isDigit)
      }
      .map(_.stripPrefix("m").toLong).sorted
      .map { v =>
        val m = readManifest(spark, root, v)
        (v, m.numBuckets, m.entries.map(_.rows).sum)
      }
  }

  private def readManifestState(
      spark: SparkSession, root: String,
      schema: org.apache.spark.sql.types.StructType,
      manifest: Option[Manifest]): DataFrame =
    manifest match {
      case Some(m) if m.entries.nonEmpty =>
        spark.read.schema(schema)
          .parquet(m.entries.map(e => s"$root/${e.relPath}"): _*)
      case _ => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }

  private def writeManifest(
      spark: SparkSession, root: String, m: Manifest): Unit = {
    val header = Seq(
      m.numBuckets.toString,
      m.lastBatch.map(b => enc(b._1)).getOrElse(""),
      m.lastBatch.map(_._2.toString).getOrElse(""),
      m.lastDelete.map(_.toString).getOrElse("")).mkString("\t")
    val body = (s"graft-manifest 2" +: header +:
      m.entries.sortBy(_.bucket).map(e =>
        s"${e.bucket}\t${e.rows}\t${enc(e.minKey)}\t${enc(e.maxKey)}\t${e.relPath}"))
      .mkString("", "\n", "\n")
    val dst = new Path(s"$root/manifest/m${m.version}")
    val tmp = new Path(s"$root/manifest/.tmp-m${m.version}")
    val fs = fsOf(spark, dst)
    fs.mkdirs(dst.getParent)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(dst, true) // superseded torn attempt (never a committed one)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"failed to commit manifest $dst")
  }

  /** Writes `df`'s rows bucketed under `data/v<version>` (one file per
    * bucket) and returns the FileEntry per written bucket, stats read
    * back from the committed files. `numTasks` sizes the write exchange
    * to the buckets actually being written — a micro-batch touching 3
    * buckets runs 3 write tasks, a full-table bootstrap runs one per
    * bucket — so task count tracks touched data, not a global setting. */
  private def writeBuckets(
      df: DataFrame,
      bucket: org.apache.spark.sql.Column,
      keyColumn: String,
      root: String,
      version: Long,
      numTasks: Int,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): Seq[FileEntry] = {
    val spark = df.sparkSession
    val dataDir = s"$root/data/v$version"
    df.withColumn(BucketCol, bucket)
      .repartition(math.max(1, numTasks), col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(dataDir)
    // Explicit schema (+ the partition column) so an all-rows-rejected
    // empty write doesn't fail schema inference.
    val writtenSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        BucketCol, org.apache.spark.sql.types.IntegerType))
    // Stats in NORMALIZED key space — the space lookup() renders its
    // probe keys in; raw-key stats would wrongly prune a file when the
    // comparator changes rendering (e.g. lower("Foo") vs "foo").
    spark.read.schema(writtenSchema)
      .option("basePath", dataDir).parquet(dataDir)
      .groupBy(col(BucketCol))
      .agg(count(lit(1)).as("rows"),
        min(keyComparator(col(keyColumn)).cast("string")).as("minKey"),
        max(keyComparator(col(keyColumn)).cast("string")).as("maxKey"))
      .collect()
      .map { r =>
        FileEntry(r.getInt(0), r.getLong(1),
          Option(r.getString(2)).getOrElse(""),
          Option(r.getString(3)).getOrElse(""),
          s"data/v$version/$BucketCol=${r.getInt(0)}")
      }.toSeq
  }

  /** Bootstraps a table from existing data: buckets `df` on the key and
    * commits it as version 0. Fails if the table already exists (use
    * `merge` to amend). */
  def create(
      df: DataFrame,
      keyColumn: String,
      root: String,
      numBuckets: Int = 16,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): Unit = {
    val spark = df.sparkSession
    require(currentVersion(spark, root).isEmpty, s"table exists at $root")
    val bucket = pmod(hash(keyComparator(col(keyColumn))), lit(numBuckets))
    val entries = writeBuckets(df, bucket, keyColumn, root, 0L, numBuckets,
      keyComparator)
    writeManifest(spark, root, Manifest(0L, numBuckets, entries))
  }

  /** One incremental MERGE of a projected source into the table.
    * `(streamId, batchId)` is the merge's IDEMPOTENCY TOKEN, not the
    * table version: foreachBatch passes its batchId (plus the checkpoint
    * path as streamId, so a stream restarted on a FRESH checkpoint —
    * batchIds reset to 0 — is a new token, not a false replay); batch
    * callers pass any token different from the previous merge's. If the
    * token equals the current manifest's `lastBatch` the call is the
    * at-least-once re-delivery of the last committed batch and a NO-OP —
    * exactly foreachBatch's replay window (only the most recent batch is
    * ever re-delivered). The table version is internal and monotone
    * (`current + 1`), so a `create()` bootstrap at version 0 never
    * swallows the stream's batch 0. Returns the entries rewritten
    * (empty on replay). */
  def merge(
      projected: DataFrame,
      batchId: Long,
      mapping: Mapping,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      mode: ImportMode = CreateAndUpdate,
      nonNullable: Seq[String] = Nil,
      numBuckets: Int = 16,
      rejectWhen: Option[org.apache.spark.sql.Column] = None,
      recordStats: Boolean = false,
      streamId: String = ""): Seq[FileEntry] = {
    val spark = projected.sparkSession
    val prior = currentManifest(spark, root)
    if (prior.exists(_.lastBatch.contains((streamId, batchId)))) return Nil
    val version = prior.map(_.version + 1).getOrElse(0L)
    // numBuckets is a TABLE property: fixed at creation, the parameter is
    // ignored once a manifest exists (a mismatch would scatter each key
    // across two bucket layouts).
    val n = prior.map(_.numBuckets).getOrElse(numBuckets)
    val key = mapping.keyColumnName
    val bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => pmod(hash(mapping.keyComparator(c)), lit(n))
    // should_import rows (flagged by the pipeline) still flow through the
    // upsert — that's where they're counted — but must not mark buckets
    // touched: an all-ignored batch rewrites nothing.
    val ignore =
      if (projected.columns.contains(Mapping.IgnoreCol))
        Some(col(Mapping.IgnoreCol))
      else None

    // 1. touched buckets: bounded distinct over ≤ n values, never a key
    //    collect. Null-keyed source rows are dropped by the upsert, so
    //    they must not mark buckets either — and the null filter has to
    //    run BEFORE bucketing (hash(null) is the seed, not null, so a
    //    null key would otherwise always touch bucket pmod(seed, n)).
    val touched = ignore.foldLeft(projected)((df, c) =>
        df.filter(!coalesce(c, lit(false))))
      .filter(mapping.keyComparator(col(key)).isNotNull)
      .select(bucketOf(col(key)).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSet
    val (touchedEntries, untouched) =
      prior.map(_.entries).getOrElse(Nil).partition(e => touched(e.bucket))

    // 2-3. target fragment = touched buckets only; standard one-join merge.
    val fragment =
      if (touchedEntries.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema)
        .parquet(touchedEntries.map(e => s"$root/${e.relPath}"): _*)
    val res = Upsert(fragment, projected, mapping, mode, nonNullable,
      rejectWhen, ignore)
    val tracked = mapping.columns.exists(_._2.opts.keepHistory)
    val multiOut = (tracked && mode.canUpdate) || recordStats
    // merged/history/stats all derive from the ONE full-outer join; with
    // several consumers, persist it once instead of re-reading the
    // fragment and re-aggregating the source per output (UpsertResult's
    // own contract, Upsert.scala:20-23).
    if (multiOut) res.joined.persist()
    try {
      // 4-5. write ONLY the touched buckets under this version's directory
      //    (one file per bucket), compute their stats from the committed
      //    files in one bounded agg, then the atomic manifest swap.
      val written = writeBuckets(res.merged, bucketOf(col(key)), key, root,
        version, math.max(touched.size, 1), mapping.keyComparator)

      // keep_history rows and import stats are part of the same commit:
      // written under version-scoped directories BEFORE the manifest
      // rename, so the rename makes state + history + stats visible
      // together (the reference commits history in the same DB transaction,
      // importtask.py:313-344,:369-371). A replay skips the whole merge, so
      // history is never duplicated; a crash before the rename leaves
      // orphans that the replay overwrites. Readers must ignore versions
      // above the current manifest (see historyOf/statsOf).
      val writesHistory = tracked && mode.canUpdate
      if (writesHistory)
        res.history.write.mode("overwrite")
          .parquet(s"$root/history/v$version")
      if (recordStats)
        res.stats.write.mode("overwrite").parquet(s"$root/stats/v$version")
      purgeOrphanSideDirs(spark, root, version,
        Set("history").filter(_ => writesHistory) ++
          Set("stats").filter(_ => recordStats))

      writeManifest(spark, root, Manifest(version, n, untouched ++ written,
        Some((streamId, batchId)), prior.flatMap(_.lastDelete)))
      written
    } finally {
      if (multiOut) res.joined.unpersist()
    }
  }

  /** Removes orphan side-directories (history/stats) left at `version`
    * by a CRASHED attempt of a different operation. Whoever commits
    * manifest `version` owns that version number: any side data it did
    * not itself write must be cleared BEFORE the manifest rename, or
    * the version-≤-current gate in committedSideDirs would make the
    * crashed attempt's uncommitted rows permanently visible (e.g. a
    * delete claiming the version of a merge that died between its
    * history write and its manifest rename). */
  private def purgeOrphanSideDirs(
      spark: SparkSession, root: String, version: Long,
      writtenKinds: Set[String]): Unit =
    Seq("history", "stats").filterNot(writtenKinds).foreach { kind =>
      val p = new Path(s"$root/$kind/v$version")
      val fs = fsOf(spark, p)
      if (fs.exists(p)) fs.delete(p, true)
    }

  /** Versions ≤ the current manifest with a committed side-directory
    * (`history/v<i>` or `stats/v<i>`). Orphans from a crashed attempt at
    * a version ABOVE the current manifest are excluded — the replay of
    * that version overwrites them. */
  private def committedSideDirs(
      spark: SparkSession, root: String, kind: String): Seq[String] =
    currentVersion(spark, root) match {
      case None => Nil
      case Some(cur) =>
        val dir = new Path(s"$root/$kind")
        val fs = fsOf(spark, dir)
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).toSeq
          .map(_.getPath.getName)
          .filter { n =>
            val s = n.stripPrefix("v")
            n.startsWith("v") && s.nonEmpty && s.forall(_.isDigit) &&
            s.toLong <= cur &&
            fs.exists(new Path(s"$root/$kind/$n/_SUCCESS"))
          }
          .sortBy(_.stripPrefix("v").toLong)
          .map(n => s"$root/$kind/$n")
    }

  /** All committed keep_history rows across versions (empty frame when
    * none). Survives `vacuum` — history records facts, not superseded
    * state. */
  def historyOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedSideDirs(spark, root, "history")
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*)
  }

  /** All committed per-merge import stats (one row per recorded version;
    * `_version` column added). */
  def statsOf(spark: SparkSession, root: String): DataFrame = {
    val dirs = committedSideDirs(spark, root, "stats")
    if (dirs.isEmpty) spark.emptyDataFrame
    else dirs.map { d =>
      val v = d.substring(d.lastIndexOf('/') + 1).stripPrefix("v").toLong
      spark.read.parquet(d).withColumn("_version", lit(v))
    }.reduce(_ unionByName _)
  }

  /** Pruned point-lookup: reads ONLY the data files that can contain the
    * requested keys — their hash buckets, further narrowed by the
    * manifest's per-bucket key ranges when the key renders as an
    * orderable string. O(|keys|/numBuckets) of the table's files instead
    * of a full scan; the scan itself still carries the key predicate so
    * parquet row-group min/max pruning applies within the file. */
  def lookup(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      keyColumn: String,
      keys: Seq[Any],
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): DataFrame =
    currentManifest(spark, root) match {
      case Some(m) if m.entries.nonEmpty && keys.nonEmpty =>
        // Bucket AND string rendering computed by Spark itself, so the
        // range check compares in exactly the space the manifest stats
        // were computed in (`cast(comparator(key) as string)` — see
        // writeBuckets) — a driver-side String.valueOf could render
        // differently and wrongly exclude a file. Stats are
        // string-ordered min/max of the stringified NORMALIZED keys, so
        // lexicographic containment is conservative-correct, and the
        // probe keys must be normalized the same way (a lower-cased
        // table probed with "Foo" must compare "foo").
        val rendered = spark.range(1)
          .select(explode(array(keys.map { k =>
            val c = keyComparator(lit(k))
            struct(
              pmod(hash(c), lit(m.numBuckets)).as("b"),
              c.cast("string").as("s"))
          }: _*)).as("k"))
          .select(col("k.b"), col("k.s"))
          .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        val hit = m.entries.filter(e => rendered.exists { case (b, s) =>
          b == e.bucket && s >= e.minKey && s <= e.maxKey
        })
        if (hit.isEmpty)
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            schema)
        else spark.read.schema(schema)
          .parquet(hit.map(e => s"$root/${e.relPath}"): _*)
          .filter(keyComparator(col(keyColumn)).isin(
            keys.map(k => keyComparator(lit(k))): _*))
      case _ => spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    }

  /** Targeted key deletion (GDPR-style erasure): removes the rows whose
    * key is in `keys`, rewriting ONLY the buckets those keys hash to —
    * the untouched rest of the table carries into the new manifest
    * verbatim, same as a MERGE. Publishes a new internal version via the
    * same atomic manifest rename; `token` is the delete's idempotency
    * token (pick any value different from the previous delete's, e.g.
    * `currentVersion + 1`) — a replay with the same token is a no-op.
    * NULL-keyed rows never match a delete key (SQL semantics) and are
    * kept when their bucket is rewritten. Cost: |touched buckets| file
    * rewrites, never a table scan. */
  def delete(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      keyColumn: String,
      keys: Seq[Any],
      token: Long,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): Seq[FileEntry] = {
    val prior = currentManifest(spark, root).getOrElse(return Nil)
    if (prior.lastDelete.contains(token)) return Nil
    val version = prior.version + 1
    val n = prior.numBuckets
    val rendered = spark.range(1)
      .select(explode(array(keys.map { k =>
        pmod(hash(keyComparator(lit(k))), lit(n))
      }: _*)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val (touchedEntries, untouched) =
      prior.entries.partition(e => rendered(e.bucket))
    if (touchedEntries.isEmpty) {
      purgeOrphanSideDirs(spark, root, version, Set.empty)
      writeManifest(spark, root, Manifest(version, n, prior.entries,
        prior.lastBatch, Some(token)))
      return Nil
    }
    // Keep-filter must be NULL-safe: `key isin (...)` is NULL for a NULL
    // key, and a bare `!NULL` filter would silently DROP null-keyed rows
    // that happen to share a bucket with a deleted key.
    val fragment = spark.read.schema(schema)
      .parquet(touchedEntries.map(e => s"$root/${e.relPath}"): _*)
      .filter(!coalesce(
        keyComparator(col(keyColumn)).isin(
          keys.map(k => keyComparator(lit(k))): _*),
        lit(false)))
    val bucket = pmod(hash(keyComparator(col(keyColumn))), lit(n))
    val written = writeBuckets(fragment, bucket, keyColumn, root, version,
      touchedEntries.size, keyComparator)
    purgeOrphanSideDirs(spark, root, version, Set.empty)
    writeManifest(spark, root, Manifest(version, n, untouched ++ written,
      prior.lastBatch, Some(token)))
    written
  }

  /** Maintenance re-bucketing: rewrites the WHOLE table under a new
    * bucket count — the one operation here whose cost is the full
    * table, by design: a key's bucket is part of the layout, so the
    * count is otherwise fixed at creation. Run it (rarely) when the
    * table has outgrown its creation-time sizing — e.g. 16 buckets
    * that were comfortable at 1 TB are 6 TB apiece at 100 TB, making
    * every MERGE's touched-bucket rewrite too coarse. Commits through
    * the same atomic manifest swap; `token` shares the maintenance
    * token space with [[delete]] (guarded by `lastDelete`), and
    * `lastBatch` carries through so streaming replay detection is
    * unaffected. */
  def rebucket(
      spark: SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      keyColumn: String,
      newNumBuckets: Int,
      token: Long,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity): Unit = {
    val prior = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(s"no table at $root"))
    if (prior.lastDelete.contains(token)) return
    val version = prior.version + 1
    val all = readManifestState(spark, root, schema, Some(prior))
    val bucket =
      pmod(hash(keyComparator(col(keyColumn))), lit(newNumBuckets))
    val written = writeBuckets(all, bucket, keyColumn, root, version,
      newNumBuckets, keyComparator)
    purgeOrphanSideDirs(spark, root, version, Set.empty)
    writeManifest(spark, root, Manifest(version, newNumBuckets, written,
      prior.lastBatch, Some(token)))
  }

  /** Deletes data directories and manifests no longer referenced by the
    * CURRENT manifest. Maintenance only — run when no reader holds an
    * older manifest (readers resolve the manifest once per query). */
  def vacuum(spark: SparkSession, root: String): Unit =
    currentManifest(spark, root).foreach { m =>
      val live: Set[String] =
        m.entries.map(_.relPath.split("/")(1)).toSet // data/<vdir>/_bucket=k
      val dataDir = new Path(s"$root/data")
      val dfs = fsOf(spark, dataDir)
      if (dfs.exists(dataDir))
        dfs.listStatus(dataDir).foreach { st =>
          if (!live(st.getPath.getName)) dfs.delete(st.getPath, true)
        }
      val manDir = new Path(s"$root/manifest")
      val mfs = fsOf(spark, manDir)
      mfs.listStatus(manDir).foreach { st =>
        if (st.getPath.getName != s"m${m.version}") mfs.delete(st.getPath, true)
      }
    }
}
