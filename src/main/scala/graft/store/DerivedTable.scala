package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.mapping.Mapping

/** Shared machinery for DERIVED manifest tables ([[MaterializedView]],
  * [[SecondaryIndex]]): a table whose contents follow a base table's
  * change feed, with the applied base version recorded in the derived
  * table's own replay ledger (`lastBatches(streamId)`) — no side ledger
  * to lose, and the merge that advances the marker is the refresh's
  * atomic commit point. */
private[store] object DerivedTable {

  /** Identity mapping over `schema` keyed by `keyCol` — derived tables
    * hold already-typed aggregate/index rows, so every column maps
    * as-is. */
  def identityMapping(schema: StructType, keyCol: String): Mapping = {
    val m = new Mapping(keyCol)
    schema.fieldNames.foreach(f => m.field(f, parser = c => c))
    m.complete(schema)
    m
  }

  private def emptyFrame(spark: SparkSession, schema: StructType) =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)

  /** Bootstraps the derived table: empty create + one marker-carrying
    * merge of the full contents. */
  def bootstrap(
      spark: SparkSession,
      full: DataFrame,
      keyCol: String,
      root: String,
      numBuckets: Int,
      streamId: String,
      baseVersion: Long): Unit = {
    val schema = full.schema
    ManifestTable.create(emptyFrame(spark, schema), keyCol, root,
      numBuckets)
    val m = identityMapping(schema, keyCol)
    ManifestTable.merge(m.project(full), baseVersion, m, root, schema,
      streamId = streamId)
  }

  /** The base version the derived table has applied. */
  def appliedVersion(
      spark: SparkSession, root: String, streamId: String): Long =
    ManifestTable.currentManifest(spark, root)
      .flatMap(_.lastBatches.get(streamId))
      .getOrElse(throw new IllegalStateException(
        s"no derived table at $root"))

  /** Advances the marker with an EMPTY merge (a base commit that nets
    * no derived-row changes, e.g. a rebucket). */
  def advanceMarker(
      spark: SparkSession,
      root: String,
      schema: StructType,
      keyCol: String,
      streamId: String,
      baseVersion: Long): Unit = {
    val m = identityMapping(schema, keyCol)
    ManifestTable.merge(m.project(emptyFrame(spark, schema)),
      baseVersion, m, root, schema, streamId = streamId)
  }

  /** The derived table's version as of its LAST completed refresh — the
    * smallest version whose ledger records `appliedBase`. A refresh
    * that crashed between its (token-guarded) deletions and its
    * marker-carrying merge leaves LATER versions with the same marker;
    * reading the derived state at this version instead of current is
    * what makes the retry see the pre-crash contents and recompute
    * correctly even when the base advanced in between. Throws if the
    * version was vacuumed (vacuum's keepLast must cover the refresh
    * cadence on a derived table). */
  def markerVersion(
      spark: SparkSession,
      root: String,
      streamId: String,
      appliedBase: Long): Long = {
    // Versions carrying a given marker are CONTIGUOUS at the top of the
    // history (earlier versions carry older markers), so walk BACKWARD
    // from current: cost is bounded by the ops since the last completed
    // refresh (normally zero — current IS the marker version), not the
    // table's whole version history.
    var v = ManifestTable.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no derived table at $root"))
    var res = -1L
    var stop = false
    while (!stop && v >= 0) {
      val carries =
        try ManifestTable.readManifest(spark, root, v)
          .lastBatches.get(streamId).contains(appliedBase)
        catch { case scala.util.control.NonFatal(_) => false } // vacuumed
      if (carries) { res = v; v -= 1 } else stop = true
    }
    if (res < 0) throw new IllegalStateException(
      s"derived table $root: the version carrying marker " +
        s"$appliedBase was vacuumed — keep the last refresh's " +
        "version in the time-travel window")
    res
  }
}
