package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.mapping.Mapping

/** A PERSISTENT incrementally-maintained aggregate view: the
  * [[IncrementalAgg]] maintained view stored AS a [[ManifestTable]], so
  * the view itself gets atomic commits, OCC, time travel, pruned
  * lookups and a change feed of its own — and refresh cost tracks the
  * base table's CHANGE RATE twice over:
  *
  *  - the base feed reads only commit-touched buckets
  *    ([[ManifestTable.changes]]);
  *  - the view read is a PRUNED LOOKUP of just the feed-touched groups;
  *  - the view write MERGES only those groups' buckets (untouched view
  *    buckets carry into the new manifest verbatim).
  *
  * Exactly-once refresh rides the manifest's replay machinery: the
  * refresh MERGE commits with `(streamId = "materialized-view",
  * batchId = base version)`, so the view table itself records how far
  * it has applied the base's history — there is no side ledger to lose,
  * and a crashed refresh replays idempotently (group deletions run
  * BEFORE the marker-carrying merge and are token-guarded, so the
  * retry re-issues them as no-ops and completes the merge).
  *
  * Constraints: one group column, non-NULL group values (a manifest
  * merge never writes NULL-keyed rows — pre-`coalesce` in `prep` if
  * NULL groups matter); exact-addition sum types (the
  * [[IncrementalAgg]] contract). */
object MaterializedView {

  /** The view's stream id in the base-version replay ledger. */
  val StreamId = "materialized-view"

  final case class View(
      baseRoot: String,
      baseSchema: StructType,
      baseKey: String,
      viewRoot: String,
      groupCol: String,
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      prep: DataFrame => DataFrame = identity,
      numBuckets: Int = 16)

  private def viewMapping(schema: StructType, groupCol: String): Mapping = {
    val m = new Mapping(groupCol)
    schema.fieldNames.foreach(f => m.field(f, parser = c => c))
    m.complete(schema)
    m
  }

  /** Bootstraps the view table from the base's CURRENT version: one
    * full aggregate, written as a fresh manifest table whose replay
    * ledger records that version. Returns the captured base version. */
  def create(spark: SparkSession, v: View): Long = {
    val cur = ManifestTable.currentVersion(spark, v.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${v.baseRoot}"))
    val full = IncrementalAgg.fullAgg(
      v.prep(ManifestTable.readAt(spark, v.baseRoot, v.baseSchema, cur)),
      Seq(v.groupCol), v.sumCols, v.minMaxCols)
    val schema = full.schema
    ManifestTable.create(
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        schema),
      v.groupCol, v.viewRoot, v.numBuckets)
    ManifestTable.merge(viewMapping(schema, v.groupCol).project(full),
      cur, viewMapping(schema, v.groupCol), v.viewRoot, schema,
      streamId = StreamId)
    cur
  }

  /** The view's committed contents. */
  def read(spark: SparkSession, v: View): DataFrame = {
    val schema = viewSchema(spark, v)
    ManifestTable.read(spark, v.viewRoot, schema)
  }

  /** How far the view has applied the base's history (the base version
    * its last refresh captured). */
  def appliedVersion(spark: SparkSession, v: View): Long =
    ManifestTable.currentManifest(spark, v.viewRoot)
      .flatMap(_.lastBatches.get(StreamId))
      .getOrElse(throw new IllegalStateException(
        s"no materialized view at ${v.viewRoot}"))

  private def viewSchema(spark: SparkSession, v: View): StructType =
    IncrementalAgg.fullAgg(
      v.prep(ManifestTable.read(spark, v.baseRoot, v.baseSchema))
        .limit(0),
      Seq(v.groupCol), v.sumCols, v.minMaxCols).schema

  /** Advances the view to the base's current version. Returns the new
    * applied version, or None when already current (including replays —
    * the merge's batch token makes re-running a completed refresh a
    * no-op). Cost ∝ the feed's touched groups, never the view or base
    * size; the min/max lost-extremum recompute reads only suspect
    * groups from the base snapshot ([[IncrementalAgg.applyChanges]]). */
  def refresh(spark: SparkSession, v: View): Option[Long] = {
    val cur = ManifestTable.currentVersion(spark, v.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${v.baseRoot}"))
    val seen = appliedVersion(spark, v)
    if (cur <= seen) return None
    val schema = viewSchema(spark, v)
    val feed = v.prep(ManifestTable.changes(spark, v.baseRoot,
      v.baseSchema, v.baseKey, seen, cur))
    // Feed-touched groups: bounded by the change rate. NULL groups are
    // rejected loudly — the manifest table cannot key on them.
    val touchedRows = feed.select(col(v.groupCol)).distinct().collect()
    if (touchedRows.isEmpty) {
      // version moved with no net row changes (e.g. rebucket): just
      // advance the marker with an empty merge
      ManifestTable.merge(
        viewMapping(schema, v.groupCol).project(
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            schema)),
        cur, viewMapping(schema, v.groupCol), v.viewRoot, schema,
        streamId = StreamId)
      return Some(cur)
    }
    require(!touchedRows.exists(_.isNullAt(0)),
      s"NULL ${v.groupCol} group reached the materialized view — " +
        "pre-coalesce NULL groups in prep")
    val touched = touchedRows.map(_.get(0)).toSeq
    // Pruned read of exactly the touched groups' current view rows.
    val old = ManifestTable.lookup(spark, v.viewRoot, schema, v.groupCol,
      touched)
    val maintained = IncrementalAgg.applyChanges(old, feed,
      Seq(v.groupCol), v.sumCols, v.minMaxCols,
      () => v.prep(
        ManifestTable.readAt(spark, v.baseRoot, v.baseSchema, cur)))
    // Groups whose count reached zero leave the view table. The delete
    // runs BEFORE the marker-carrying merge: a crash in between replays
    // the delete as a token no-op and completes the merge — never the
    // reverse order, which would lose the deletions forever behind the
    // already-advanced marker.
    val kept = maintained.select(col(v.groupCol)).collect()
      .map(_.get(0)).toSet
    val vanished = touched.filterNot(kept)
    if (vanished.nonEmpty)
      ManifestTable.delete(spark, v.viewRoot, schema, v.groupCol,
        vanished, token = cur)
    ManifestTable.merge(
      viewMapping(schema, v.groupCol).project(maintained),
      cur, viewMapping(schema, v.groupCol), v.viewRoot, schema,
      streamId = StreamId)
    Some(cur)
  }
}
