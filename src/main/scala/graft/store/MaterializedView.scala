package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A PERSISTENT incrementally-maintained aggregate view: the
  * [[IncrementalAgg]] maintained view stored AS a [[ManifestTable]], so
  * the view itself gets atomic commits, OCC, time travel, pruned
  * lookups and a change feed of its own — and refresh cost tracks the
  * base table's CHANGE RATE twice over:
  *
  *  - the base feed reads only commit-touched buckets
  *    ([[ManifestTable.changes]]);
  *  - the view read covers only the feed-touched groups (a PRUNED
  *    LOOKUP on the no-crash fast path);
  *  - the view write MERGES only those groups' buckets (untouched view
  *    buckets carry into the new manifest verbatim).
  *
  * Exactly-once refresh rides the manifest's replay machinery: the
  * refresh MERGE commits with `(streamId = "materialized-view",
  * batchId = base version)`, so the view table itself records how far
  * it has applied the base's history — there is no side ledger to lose.
  * A refresh that crashes between its (token-guarded) group deletions
  * and the marker-carrying merge replays correctly EVEN IF THE BASE
  * ADVANCED in between: the retry reads the touched groups' rows from
  * the view's snapshot AT the marker ([[DerivedTable.markerVersion]] —
  * the state the extended feed window's deltas apply to), so the
  * half-applied deletions cannot double-count.
  *
  * Constraints: non-NULL group values (a manifest merge never writes
  * NULL-keyed rows — pre-`coalesce` in `prep` if NULL groups matter;
  * [[create]] enforces this up front) and exact-addition sum types
  * (the [[IncrementalAgg]] contract). MULTI-column groups are
  * supported: the view table stores the group columns plus a synthetic
  * manifest key ([[DerivedTable.KeyCol]], an injective string encoding
  * of the tuple) and keys on that; single-column views keep the group
  * column itself as the key — their on-disk layout is identical to
  * before multi-column support existed. */
object MaterializedView {

  /** The view's stream id in the base-version replay ledger. */
  val StreamId = "materialized-view"

  /** The token space refresh's vanished-group deletions commit under
    * (see [[DerivedTable.deleteStream]]): user deletes on the view root
    * keep their own `lastDelete` space and can never collide with a
    * refresh token. */
  val DeleteStream: String = DerivedTable.deleteStream(StreamId)

  /** The default (absent) `prep` — a NAMED identity so registration can
    * tell "no prep" from a caller-supplied transform by reference: a
    * view defined purely by (groupCols, sumCols, minMaxCols) is fully
    * reconstructible from a registry row and can auto-maintain from
    * the base's commit hook; an arbitrary prep FUNCTION cannot ride a
    * parquet sidecar, so such views keep explicit refresh. */
  val NoPrep: DataFrame => DataFrame = identity

  final case class View(
      baseRoot: String,
      baseSchema: StructType,
      baseKey: String,
      viewRoot: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      prep: DataFrame => DataFrame = NoPrep,
      numBuckets: Int = 16) {
    require(groupCols.nonEmpty, "need at least one group column")
  }

  /** The view table's manifest key: the group column itself when
    * single, the synthetic encoded-tuple column when composite. */
  private def keyCol(v: View): String =
    if (v.groupCols.size == 1) v.groupCols.head else DerivedTable.KeyCol

  /** Appends the synthetic key column for composite groups (no-op for
    * single-column views). */
  private def withKey(v: View, df: DataFrame): DataFrame =
    if (v.groupCols.size == 1) df
    else df.withColumn(DerivedTable.KeyCol,
      DerivedTable.encodeKey(v.groupCols.map(col)))

  /** Bootstraps the view table from the base's CURRENT version: one
    * full aggregate, written as a fresh manifest table whose replay
    * ledger records that version. Rejects NULL groups up front — a
    * silent drop here would surface as a refresh-time brick later.
    * Returns the captured base version. */
  /** The base-root registry of views (the [[SecondaryIndex]] `indexreg`
    * mechanism, `viewreg` kind): rows record everything needed to
    * reconstruct a prep-less View, so the base's declared maintenance
    * hook ([[ManifestTable.autoMaintain]] `derived = true`) can refresh
    * views it discovers from the root alone. Advisory: a row whose view
    * root no longer holds a manifest (dropped view) is skipped. */
  private val RegistrySchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("group_cols",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("sum_cols",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("minmax_cols",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("view_root",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("num_buckets",
      org.apache.spark.sql.types.IntegerType)))

  /** Records `v` on its base table so commit-hook maintenance can
    * discover it. Refused for views with a caller-supplied `prep` —
    * a function cannot ride a parquet sidecar, and registering a view
    * the hook would then refresh WITHOUT its prep would silently
    * maintain the wrong aggregate. [[create]] registers automatically
    * exactly when the view is prep-less. */
  def register(spark: SparkSession, v: View): Unit = {
    require(v.prep eq NoPrep,
      s"view at ${v.viewRoot} has a caller-supplied prep transform — " +
        "it cannot be reconstructed from a registry row; keep explicit " +
        "refresh for it")
    val m = ManifestTable.currentManifest(spark, v.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${v.baseRoot}"))
    val row = org.apache.spark.sql.Row(v.groupCols.mkString(","),
      v.sumCols.mkString(","), v.minMaxCols.mkString(","),
      v.viewRoot, Integer.valueOf(v.numBuckets))
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), RegistrySchema)
    ManifestTable.writeAdditiveSidecar(spark, v.baseRoot, m, df,
      "viewreg")
  }

  /** The base's registered, resolvable, PREP-LESS views — what the
    * commit hook refreshes. Newest registry row per view root wins;
    * rows whose view root has no manifest, or whose columns have left
    * the caller's schema, are skipped. */
  def registeredViews(spark: SparkSession, baseRoot: String,
      baseSchema: StructType): Seq[View] = {
    val dirs = ManifestTable.committedAdditiveDirs(spark, baseRoot,
      "viewreg")
    if (dirs.isEmpty) return Nil
    val m = ManifestTable.currentManifest(spark, baseRoot)
      .getOrElse(return Nil)
    val newest = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.Row]
    dirs.foreach { d =>
      spark.read.schema(RegistrySchema).parquet(d).collect().foreach {
        r => newest(r.getString(3)) = r
      }
    }
    def cols(x: String) =
      x.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    newest.values.toSeq.flatMap { r =>
      val gs = cols(r.getString(0))
      val ss = cols(r.getString(1))
      val ms = cols(r.getString(2))
      val root = r.getString(3)
      if (ManifestTable.currentVersion(spark, root).isEmpty) None
      else if (!(gs ++ ss ++ ms).forall(c =>
        baseSchema.fieldNames.contains(c))) None
      else Some(View(baseRoot, baseSchema, m.keyColumn, root, gs, ss,
        ms, numBuckets = r.getInt(4)))
    }
  }

  def create(spark: SparkSession, v: View): Long = {
    val cur = ManifestTable.currentVersion(spark, v.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${v.baseRoot}"))
    val full = IncrementalAgg.fullAgg(
      v.prep(ManifestTable.readAt(spark, v.baseRoot, v.baseSchema, cur)),
      v.groupCols, v.sumCols, v.minMaxCols).persist()
    try {
      require(full.filter(v.groupCols.map(col(_).isNull)
          .reduce(_ || _)).limit(1).count() == 0L,
        s"NULL ${v.groupCols.mkString("/")} group in the base — a " +
          "manifest table cannot key on NULL; pre-coalesce NULL " +
          "groups in prep")
      DerivedTable.bootstrap(spark, withKey(v, full), keyCol(v),
        v.viewRoot, v.numBuckets, StreamId, cur)
      // prep-less views register on the base so commit-hook maintenance
      // can discover and refresh them (prep functions can't ride a
      // sidecar — those views keep explicit refresh)
      if (v.prep eq NoPrep) register(spark, v)
      cur
    } finally full.unpersist()
  }

  /** The view's committed contents (the synthetic key column of a
    * composite-group view is an internal detail and is dropped). */
  def read(spark: SparkSession, v: View): DataFrame =
    ManifestTable.read(spark, v.viewRoot, viewSchema(spark, v))
      .drop(DerivedTable.KeyCol)

  /** How far the view has applied the base's history (the base version
    * its last refresh captured). */
  def appliedVersion(spark: SparkSession, v: View): Long =
    DerivedTable.appliedVersion(spark, v.viewRoot, StreamId)

  /** The view table's STORED schema (incl. the synthetic key column of
    * a composite-group view). Plan-time only, and metadata-free: built
    * over an empty LOCAL frame of the declared base schema — deriving
    * it used to re-read the current base manifest on every call, a
    * wasted metadata round-trip per refresh. */
  private def viewSchema(spark: SparkSession, v: View): StructType = {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      v.baseSchema)
    withKey(v, IncrementalAgg.fullAgg(v.prep(empty),
      v.groupCols, v.sumCols, v.minMaxCols)).schema
  }

  /** Advances the view to the base's current version. Returns the new
    * applied version, or None when already current (including replays —
    * the merge's batch token makes re-running a completed refresh a
    * no-op). Cost ∝ the feed's touched groups, never the view or base
    * size; the min/max lost-extremum recompute reads only suspect
    * groups from the base snapshot ([[IncrementalAgg.applyChanges]]).
    *
    * DRIVER-BOUNDED at any change rate: the driver only ever holds at
    * most `maxDriverKeys` group keys. Under the cap the touched keys
    * collect and drive PRUNED lookups (the selective fast path); past
    * it — a bulk backfill touching millions of groups — everything
    * degrades to distributed semi-joins against the marker snapshot,
    * which is the right plan at that selectivity anyway (millions of
    * keys hash across ~every view bucket, so the "pruned" read would
    * have touched the whole view regardless). Vanished-group deletions
    * cross the driver in [[DerivedTable.deleteChunked]] chunks of the
    * same bound. */
  def refresh(spark: SparkSession, v: View,
      maxDriverKeys: Int = 100000): Option[Long] = {
    val cur = ManifestTable.currentVersion(spark, v.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${v.baseRoot}"))
    // ONE current-manifest read serves the marker, the marker-version
    // walk start and the fast-path check below.
    val curView = ManifestTable.currentManifest(spark, v.viewRoot)
      .getOrElse(throw new IllegalStateException(
        s"no materialized view at ${v.viewRoot}"))
    val seen = curView.lastBatches.getOrElse(StreamId,
      throw new IllegalStateException(
        s"no materialized view at ${v.viewRoot}"))
    if (cur <= seen) return None
    val schema = viewSchema(spark, v)
    val key = keyCol(v)
    // The feed backs several bounded actions below (touched count,
    // suspect detection, the merge write) — persist it so the touched
    // buckets' diff join runs once, not once per action.
    val feed = v.prep(ManifestTable.changes(spark, v.baseRoot,
      v.baseSchema, v.baseKey, seen, cur)).persist()
    try {
      // Feed-touched groups: kept DISTRIBUTED (the driver sees a count,
      // never the keys) — selected WITH the encoded key so lookup /
      // delete probes below never re-encode. localCheckpoint (not a
      // bare persist): it backs the count, the NULL audit, the `old`
      // restriction AND the vanished anti-join — the last joins it
      // against a plan derived from it, which the analyzer would
      // reject as an ambiguous self-join unless the lineage is cut.
      // Eagerly materialized once, executor-resident, bounded by the
      // touched-group count; a lost executor fails the (retryable)
      // refresh.
      val composite = v.groupCols.size > 1
      val sel =
        if (composite) col(DerivedTable.KeyCol) +: v.groupCols.map(col)
        else v.groupCols.map(col)
      val touchedDf = withKey(v, feed)
        .select(sel: _*).dropDuplicates(key).localCheckpoint()
      try {
        // ONE bounded action decides everything below: up to cap+1
        // touched rows come back (the driver never holds more), giving
        // emptiness, the small/large branch, the NULL audit and — on
        // the small path — the probe keys themselves, without separate
        // count/audit/collect jobs.
        val headRows = touchedDf.limit(maxDriverKeys + 1).collect()
        if (headRows.isEmpty) {
          // version moved with no net row changes (e.g. rebucket)
          DerivedTable.advanceMarker(spark, v.viewRoot, schema, key,
            StreamId, cur)
          return Some(cur)
        }
        val small = headRows.length <= maxDriverKeys
        // NULL groups are rejected loudly — the manifest table cannot
        // key on them. Driver-side over the full set when it fits,
        // distributed probe past the cap.
        val gOff = if (composite) 1 else 0
        require(
          if (small) !headRows.exists(r =>
            v.groupCols.indices.exists(i => r.isNullAt(gOff + i)))
          else touchedDf.filter(v.groupCols.map(col(_).isNull)
            .reduce(_ || _)).limit(1).count() == 0L,
          s"NULL ${v.groupCols.mkString("/")} group reached the " +
            "materialized view — pre-coalesce NULL groups in prep")
        // The touched groups' rows AS OF THE MARKER — the snapshot the
        // feed window's deltas apply to. On the fast path (no crashed
        // refresh since) that snapshot IS the current version and the
        // read is a pruned lookup; after a crash-with-base-advance it
        // is an earlier retained version and correctness wins over
        // pruning.
        val vSeen = DerivedTable.markerVersion(spark, v.viewRoot,
          StreamId, seen, curView)
        val old =
          if (!small)
            // Cap exceeded: distributed semi-join on the snapshot read.
            ManifestTable.readAt(spark, v.viewRoot, schema, vSeen)
              .join(touchedDf.select(col(key)), Seq(key), "left_semi")
          else if (curView.version == vSeen) {
            val touched = headRows.map(_.get(0)).toIndexedSeq
            ManifestTable.lookup(spark, v.viewRoot, schema, key, touched)
          } else
            // Crash path under the cap: snapshot read restricted by a
            // BROADCAST semi-join (an isin literal list here became a
            // giant-In plan as the touched count grew).
            ManifestTable.readAt(spark, v.viewRoot, schema, vSeen)
              .join(broadcast(touchedDf.select(col(key))), Seq(key),
                "left_semi")
        val maintained = IncrementalAgg.applyChanges(
          old.drop(DerivedTable.KeyCol), feed,
          v.groupCols, v.sumCols, v.minMaxCols,
          () => v.prep(
            ManifestTable.readAt(spark, v.baseRoot, v.baseSchema, cur)),
          suspectsBounded = small)
        val keyed = withKey(v, maintained).persist()
        try {
          // Groups whose count reached zero leave the view table. The
          // delete runs BEFORE the marker-carrying merge and is
          // token-guarded (in the refresh's OWN token space — a user
          // delete on the view root can never collide with it): a
          // crashed refresh's retry re-issues it as a no-op and
          // completes the merge — never the reverse order, which would
          // lose the deletions forever behind the already-advanced
          // marker. Vanished = touched ∖ kept, computed DISTRIBUTED
          // (the old kept-keys collect pulled every touched group to
          // the driver) and deleted in driver-bounded chunks.
          val vanishedDf = touchedDf.select(col(key))
            .join(keyed.select(col(key)), Seq(key), "left_anti")
          DerivedTable.deleteChunked(spark, v.viewRoot, schema, key,
            vanishedDf, cur, DeleteStream, maxDriverKeys)
          val m = DerivedTable.identityMapping(schema, key)
          ManifestTable.merge(m.project(keyed), cur, m, v.viewRoot,
            schema, streamId = StreamId)
          Some(cur)
        } finally keyed.unpersist()
      } finally touchedDf.unpersist()
    } finally feed.unpersist()
  }
}
