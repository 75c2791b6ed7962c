package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.Dedup

/** Continuous near-duplicate detection with an INCREMENTALLY MAINTAINED
  * MinHash band index — the missing piece between the batch
  * [[graft.operators.Dedup.minhashLsh]] (full self-join) and the
  * stream-static check (frozen reference corpus): every arriving document
  * is checked against ALL previously indexed documents, then added to the
  * index, without ever rescanning history.
  *
  * Storage layout under `indexRoot`: committed delta directories
  * `d<batchId>` (same `_SUCCESS` + temp-write + atomic-rename discipline
  * as [[StreamingImport]]), each holding (doc_id, band, bh) rows for one
  * micro-batch. Readers union the committed deltas; when their count
  * exceeds `compactEvery`, the batch merges the two SMALLEST runs with
  * itself (size-tiered, LSM-style) — the delta count stays
  * O(compactEvery), mature large runs are not rewritten, and the
  * per-batch work is (batch bands) ⋈ (index bands): an equi-join whose
  * left side is micro-batch-sized.
  *
  * At 100 TB the index relation is the SLIM (doc_id, band, bh) projection
  * (a few dozen bytes per doc per band) — the heavy text never enters it.
  */
object StreamingDedup {

  val indexSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", org.apache.spark.sql.types.IntegerType,
      nullable = false),
    StructField("bh", LongType, nullable = false)))

  /** Committed run dirs split into (live, superseded-but-on-disk) names.
    * A compaction's merged run carries a `_MERGED` tombstone file naming
    * the source runs it replaced — committed atomically WITH the run by
    * the same rename — so a run named by any committed run's tombstone is
    * logically deleted even if its directory still exists (crash between
    * publish and delete). Tombstones are unioned across ALL on-disk
    * committed runs (including superseded ones) so chains of crashed
    * compactions resolve transitively. */
  private def listRuns(
      spark: SparkSession, indexRoot: String): (Seq[String], Seq[String]) = {
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Nil, Nil)
    val committed = fs.listStatus(root).toSeq
      .filter { st =>
        // require a NON-EMPTY numeric suffix: drop(1).forall(_.isDigit)
        // is vacuously true for a dir named exactly "d", and the sort
        // below would then throw on "".toLong, failing every batch.
        val n = st.getPath.getName.drop(1)
        st.isDirectory && st.getPath.getName.startsWith("d") &&
        n.nonEmpty && n.forall(_.isDigit) &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
      }
      .map(_.getPath.getName)
      .sortBy(_.stripPrefix("d").toLong)
    val superseded: Set[String] = committed.flatMap { n =>
      val t = new org.apache.hadoop.fs.Path(s"$indexRoot/$n/_MERGED")
      if (!fs.exists(t)) Nil
      else {
        val in = fs.open(t)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
        finally in.close()
      }
    }.toSet
    committed.partition(n => !superseded(n))
  }

  /** Live committed delta dirs (name `d<n>`, `_SUCCESS` present, not
    * superseded by a compaction tombstone), as paths, sorted. Listed
    * through the Hadoop FileSystem API — the index lives on cluster
    * storage (HDFS/S3), where a `java.io.File` listing would silently
    * return nothing and every batch would publish pairs against an empty
    * index. */
  def committedDeltas(spark: SparkSession, indexRoot: String): Seq[String] =
    listRuns(spark, indexRoot)._1.map(n => s"$indexRoot/$n")

  /** The full committed index (empty frame when none). */
  def readIndex(spark: SparkSession, indexRoot: String): DataFrame = {
    val deltas = committedDeltas(spark, indexRoot)
    if (deltas.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        indexSchema)
    else spark.read.schema(indexSchema).parquet(deltas: _*)
  }

  /** Temp-write + atomic-rename publish. The FS is resolved from the
    * destination path (not `FileSystem.get`): with `root` on a
    * non-default filesystem, the default FS throws "Wrong FS" on
    * rename/delete. `supersedes` names source runs this one replaces —
    * written as a `_MERGED` tombstone inside the temp dir BEFORE the
    * rename, so the one atomic rename commits the merged run and the
    * logical deletion of its sources together. NOTE: relies on rename
    * atomicity — true on HDFS and ABFS, NOT on raw S3; document/guard
    * accordingly in deployments. */
  private def publish(df: DataFrame, root: String, name: String,
      supersedes: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val tmp = s"$root/.tmp-$name"
    df.write.mode("overwrite").parquet(tmp)
    val dst = new org.apache.hadoop.fs.Path(s"$root/$name")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (supersedes.nonEmpty) {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$tmp/_MERGED"), true)
      try out.write(supersedes.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    fs.delete(dst, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new java.io.IOException(s"failed to publish $dst")
  }

  /** One micro-batch: publish the (doc_id, matched_id) candidate pairs of
    * the batch against everything indexed BEFORE it to
    * `pairsRoot/p<batchId>`, THEN append the batch's bands as delta
    * `d<batchId>`, compacting when the delta count exceeds `compactEvery`.
    * Pairs are always materialized before the index mutates. Idempotent
    * under replay: a committed `d<batchId>` is excluded from the
    * comparison index (a batch never matches itself), and both outputs
    * re-publish atomically. */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      indexRoot: String,
      pairsRoot: String,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      compactEvery: Int = 8,
      maxBucketSize: Int = 10000,
      maxBroadcastRows: Long = 2000000L): Unit = {
    val spark = batch.sparkSession
    val self = s"d$batchId"
    val (liveNames, staleNames) = listRuns(spark, indexRoot)
    if (liveNames.contains(self) || staleNames.contains(self)) {
      // Replay of a FULLY published batch (delta commit is the last
      // write): pairs/p<batchId> is already on disk and the comparison
      // set may since have been compacted away — recomputing here would
      // overwrite good pairs with garbage. No-op is the idempotent move.
      return
    }
    if (staleNames.nonEmpty) {
      // Janitor: runs superseded by a committed compaction tombstone are
      // logically dead (excluded from every listing) — a crash between
      // that compaction's publish and its source deletion left them on
      // disk. Sweep here, in the single writer.
      val fs = new org.apache.hadoop.fs.Path(indexRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      staleNames.foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexRoot/$n"), true))
    }
    val priorDeltas = liveNames.map(n => s"$indexRoot/$n")
    val prior =
      if (priorDeltas.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          indexSchema)
      else spark.read.schema(indexSchema).parquet(priorDeltas: _*)

    // Batch bands: computed ONCE (persisted — they feed the broadcast,
    // both self-join sides and the delta publish), skew-capped like the
    // batch-path minhashLsh so one degenerate bucket can't go quadratic.
    val batchIdx = Dedup.capBuckets(
      Dedup.bandIndex(batch, bands, rowsPerBand),
      Seq("band", "bh"), maxBucketSize).persist()
    val batchRows = batchIdx.count()
    try {
      // Cross-batch candidates: for normal micro-batches the batch side
      // broadcasts, so the (large) committed index streams through a
      // map-side hash join — the index is never shuffled. An oversized
      // batch (e.g. the first AvailableNow backlog) would blow the 8 GB
      // broadcast limit, so above maxBroadcastRows it falls back to a
      // plain equi-join: slower, never fatal.
      val batchSide =
        if (batchRows <= maxBroadcastRows) broadcast(batchIdx) else batchIdx
      val crossPairs = prior.withColumnRenamed("doc_id", "matched_id")
        .join(batchSide, Seq("band", "bh"))
        .select(col("doc_id"), col("matched_id"))
      // Within-batch candidates: two near-dups arriving in the SAME batch
      // never meet the prior index, so the (capped) batch also self-joins.
      val a = batchIdx.alias("a")
      val b = batchIdx.alias("b")
      val selfPairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"),
          col("b.doc_id").as("matched_id"))
      val pairs = crossPairs.union(selfPairs).distinct()
      publish(pairs, pairsRoot, s"p$batchId")

      if (priorDeltas.length + 1 > compactEvery) {
        // SIZE-TIERED compaction (LSM-style): merge ONLY the two
        // smallest prior deltas with this batch — never the whole
        // index. Mature large runs are left untouched until they
        // themselves become the smallest pair, so runs form geometric
        // tiers and cumulative compaction write is O(N log N), not the
        // O(N²/compactEvery) a rewrite-everything policy costs — the
        // same touched-data principle as the ManifestTable MERGE. The
        // delta count still stays < compactEvery. Crash-safety: the
        // merged run's `_MERGED` tombstone (see publish) commits the
        // logical deletion of its sources atomically with the run
        // itself, so a crash before the physical deletes below cannot
        // double-count rows — the leftovers are invisible to every
        // listing and swept by the next batch's janitor. The re-cap
        // bounds hot buckets that accumulated across the merged runs
        // (the cap is per-run between compactions, as before).
        val fs = new org.apache.hadoop.fs.Path(indexRoot)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val toMerge = priorDeltas
          .sortBy(d => fs.getContentSummary(
            new org.apache.hadoop.fs.Path(d)).getLength)
          .take(2)
        val mergeDf = spark.read.schema(indexSchema).parquet(toMerge: _*)
        publish(
          Dedup.capBuckets(mergeDf.union(batchIdx).distinct(),
            Seq("band", "bh"), maxBucketSize),
          indexRoot, self,
          supersedes = toMerge.map(_.substring(indexRoot.length + 1)))
        toMerge.foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
      } else {
        publish(batchIdx, indexRoot, self)
      }
    } finally {
      batchIdx.unpersist()
    }
  }

  /** Binds an index root to ONE checkpoint incarnation. applyBatch's
    * replay detection keys on the run name `d<batchId>` — sound within
    * one checkpoint's monotone batch ids, but a WIPED/recreated
    * checkpoint (or a different query pointed at the same indexRoot)
    * restarts batch ids at 0, and the colliding names made brand-new
    * documents silently skip indexing and pair emission. First use
    * records the owner; a mismatch refuses LOUDLY instead. */
  private[graft] def ensureOwner(
      spark: org.apache.spark.sql.SparkSession,
      indexRoot: String,
      identity: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/_owner")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // First use claims ownership with overwrite=FALSE so exactly one
    // incarnation wins atomically: check-then-create with overwrite
    // let two queries binding the same fresh indexRoot both pass the
    // exists() check, and the later create silently stole ownership —
    // the colliding-incarnation case this guard exists to refuse.
    val claimed = !fs.exists(p) && {
      fs.mkdirs(p.getParent)
      try {
        val out = fs.create(p, false)
        try out.write(identity.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false } // lost the race
    }
    if (!claimed) {
      // losers re-open and compare; the winner's write may still be in
      // flight on a non-atomic local FS, so an EMPTY read retries
      // briefly before refusing (refusal is the safe direction)
      var owner = ""
      var tries = 0
      while (owner.isEmpty && tries < 5) {
        val in = fs.open(p)
        owner =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        if (owner.isEmpty) { Thread.sleep(20L * (tries + 1)); tries += 1 }
      }
      require(owner == identity,
        s"near-dup index at $indexRoot belongs to checkpoint " +
          s"incarnation '$owner', not '$identity' — its batch-id " +
          "replay ledger would silently skip this query's batches. " +
          "Point the new query at a FRESH indexRoot (or delete the " +
          "stale index, including _owner, if it is abandoned)")
    }
  }

  /** Starts the continuous near-dup monitor: `docStream` is a streaming
    * (doc_id, text) frame; candidate pairs per batch land under
    * `pairsRoot/p<batchId>`. */
  def start(
      docStream: DataFrame,
      indexRoot: String,
      pairsRoot: String,
      checkpoint: String,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      compactEvery: Int = 8,
      maxBucketSize: Int = 10000,
      maxBroadcastRows: Long = 2000000L): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ensureOwner(batch.sparkSession, indexRoot,
          StreamingImport.checkpointIdentity(
            batch.sparkSession, checkpoint))
        applyBatch(batch, batchId, indexRoot, pairsRoot, bands,
          rowsPerBand, compactEvery, maxBucketSize, maxBroadcastRows)
      }
      .start()
}
