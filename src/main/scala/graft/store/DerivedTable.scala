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
private[graft] object DerivedTable {

  /** The token space a refresh's vanished-group deletions commit under:
    * separate from the user-facing `lastDelete` space, so a
    * machine-chosen token (a base version) can never collide with a
    * user's delete token on the same derived table — and its presence
    * in the ledger is the crash signature [[markerVersion]] checks (a
    * delete token AHEAD of the applied marker can only come from a
    * refresh that crashed before its marker-carrying merge). */
  def deleteStream(streamId: String): String = streamId + "#delete"

  /** Synthetic manifest-key column for MULTI-column derived keys: a
    * manifest table keys on one column, so a composite group/value
    * tuple is stored alongside an injective string encoding of itself
    * and the table keys on that. Single-column derived tables keep the
    * column itself as the key (no synthetic column, no encoding) — the
    * layout is unchanged from before multi-column support existed. */
  val KeyCol = "_gkey"

  /** Injective string encoding of a column tuple: parts joined on
    * \u0001 with \u0002-escaping of both control characters inside a
    * part, and a lone \u0002 for NULL (escaped output never produces a
    * bare \u0002, so NULL cannot collide with any real value). Two
    * tuples encode equal iff their string-cast parts are equal — the
    * only identity the key needs. Applied to GROUP tuples only (view /
    * index rows, ∝ distinct groups), never to base-table fact rows. */
  def encodeKey(cols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    concat_ws("\u0001", cols.map(c =>
      when(c.isNull, lit("\u0002")).otherwise(
        regexp_replace(c.cast("string"), "([\u0001\u0002])",
          "\u0002$1"))): _*)
  }

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
    * merge of the full contents. `rangeBounds` lays the table out by
    * range on the key ([[ManifestTable.create]]). */
  def bootstrap(
      spark: SparkSession,
      full: DataFrame,
      keyCol: String,
      root: String,
      numBuckets: Int,
      streamId: String,
      baseVersion: Long,
      rangeBounds: Seq[String] = Nil): Unit = {
    val schema = full.schema
    ManifestTable.create(emptyFrame(spark, schema), keyCol, root,
      numBuckets, rangeBounds = rangeBounds)
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

  /** Deletes the keys of a (single-column) key frame from a derived
    * table in DRIVER-BOUNDED chunks: at most `maxDriverKeys` keys are
    * ever resident on the driver at once, so a refresh whose vanished
    * set exploded (a bulk base delete) cannot OOM the driver or build a
    * million-literal probe plan. Chunks are DETERMINISTIC (keys sorted
    * by string rendering), so a crashed multi-chunk delete replays
    * chunk-for-chunk: a chunk whose token is already in the ledger is
    * provably the SAME chunk and no-ops.
    *
    * Token discipline: the FINAL chunk commits under `baseVersion`
    * itself — after the refresh's marker-carrying merge the recorded
    * delete token equals the marker, preserving [[markerVersion]]'s
    * crash signature (`token > marker` ⇔ in flight). Non-final chunks
    * use `baseVersion * 1e6 + i`: distinct per chunk, > the pre-refresh
    * marker (so a crash mid-chunks still reads as in-flight), and
    * always overwritten by the final chunk's `baseVersion` on
    * completion. */
  def deleteChunked(
      spark: SparkSession,
      root: String,
      schema: StructType,
      keyCol: String,
      keyFrame: DataFrame,
      baseVersion: Long,
      tokenStream: String,
      maxDriverKeys: Int,
      delta: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.col
    // Common case first: the whole set fits one chunk (usually a
    // handful of vanished groups, often zero) — ONE bounded
    // limit-collect, no sort job, and the single delete keeps the
    // pre-chunking token behavior (token = baseVersion).
    val head = keyFrame.limit(maxDriverKeys + 1).collect()
    if (head.isEmpty) return
    if (head.length <= maxDriverKeys) {
      ManifestTable.delete(spark, root, schema, keyCol,
        head.map(_.get(0)).toIndexedSeq, token = baseVersion,
        tokenStream = Some(tokenStream), delta = delta)
      return
    }
    // Past the cap: deterministic sorted chunks. The key itself
    // tiebreaks equal renderings, so the chunking order (and hence
    // each token's chunk content) is total and stable across retries.
    val it = keyFrame.orderBy(col(keyCol).cast("string"), col(keyCol))
      .toLocalIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var chunk = 0
    def flush(last: Boolean): Unit = {
      val token =
        if (last) baseVersion else baseVersion * 1000000L + chunk
      ManifestTable.delete(spark, root, schema, keyCol, buf.toSeq,
        token = token, tokenStream = Some(tokenStream), delta = delta)
      chunk += 1
      buf.clear()
    }
    while (it.hasNext) {
      buf += it.next().get(0)
      if (buf.size >= maxDriverKeys && it.hasNext) flush(last = false)
    }
    if (buf.nonEmpty) flush(last = true)
  }

  /** The derived table's version as of its LAST completed refresh — the
    * smallest version whose ledger records `appliedBase`. A refresh
    * that crashed between its (token-guarded) deletions and its
    * marker-carrying merge leaves LATER versions with the same marker;
    * reading the derived state at this version instead of current is
    * what makes the retry see the pre-crash contents and recompute
    * correctly even when the base advanced in between. The walk stops
    * at the oldest RETAINED marker-carrying version — vacuum's keepLast
    * must cover the refresh cadence on a derived table. When the ledger
    * proves a refresh crashed in flight (a [[deleteStream]] token ahead
    * of the applied marker) AND the walk bottomed out on a vacuumed
    * manifest — i.e. the true marker version may have been retired and
    * the result could be a half-refreshed snapshot — this FAILS LOUDLY
    * instead of silently returning that snapshot; restore from a longer
    * keepLast or re-bootstrap the derived table. */
  def markerVersion(
      spark: SparkSession,
      root: String,
      streamId: String,
      appliedBase: Long,
      current: ManifestTable.Manifest): Long = {
    // Versions carrying a given marker are CONTIGUOUS at the top of the
    // history (earlier versions carry older markers), so walk BACKWARD
    // from the caller-provided current manifest (which always carries
    // the marker — `appliedBase` was read from it): cost is bounded by
    // the ops since the last completed refresh (normally zero — current
    // IS the marker version), not the table's whole version history.
    require(current.lastBatches.get(streamId).contains(appliedBase),
      s"current manifest of $root does not carry marker $appliedBase")
    var res = current.version
    var v = current.version - 1
    var stop = false
    var vacuumStopped = false
    while (!stop && v >= 0) {
      // ONLY a missing manifest means "vacuumed — stop the walk". A
      // transient read failure must PROPAGATE: swallowing it would
      // return a too-high version, and the caller's fast path would
      // then read a half-refreshed current state — exactly the
      // corruption the marker walk exists to prevent.
      val carries =
        try ManifestTable.readManifest(spark, root, v)
          .lastBatches.get(streamId).contains(appliedBase)
        catch {
          case _: java.io.FileNotFoundException =>
            vacuumStopped = true; false
        }
      if (carries) { res = v; v -= 1 } else stop = true
    }
    // In-flight-crash signature: refresh deletions committed AFTER the
    // last completed refresh. Benign walks also end on a vacuumed
    // manifest (keepLast=1 leaves only the current version), but with a
    // crash in flight a vacuumed stop means the true marker version may
    // itself have been retired — returning `res` could silently serve a
    // snapshot with half-applied deletions, so refuse.
    val crashInFlight = current.lastBatches
      .get(deleteStream(streamId)).exists(_ > appliedBase)
    if (crashInFlight && vacuumStopped)
      throw new IllegalStateException(
        s"derived table at $root: a refresh crashed in flight (delete " +
          s"token ${current.lastBatches(deleteStream(streamId))} is " +
          s"ahead of applied marker $appliedBase) and vacuum retired " +
          "manifests below the retained history — the pre-crash marker " +
          s"snapshot may be gone (walk stopped at version $res). " +
          "Vacuum keepLast must cover the refresh cadence on derived " +
          "tables; restore from backup or re-bootstrap the derived table.")
    res
  }
}
