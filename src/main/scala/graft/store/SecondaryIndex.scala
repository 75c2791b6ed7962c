package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** SECONDARY INDEX for the manifest table: an inverted (value → sorted
  * key list) table — itself a [[ManifestTable]] — over one or more
  * non-key columns, maintained from the base's change feed. A point
  * predicate on the indexed column(s) becomes TWO PRUNED LOOKUPS
  * (index value → keys, then keys → base rows) instead of a full scan;
  * at 100 TB that is the difference between reading two buckets and
  * reading the table.
  *
  * Maintenance reads NOTHING but the feed and the touched index rows:
  * each affected key's window-FINAL assignment (its value at the feed's
  * end, or gone) and window-START assignment (the value the index
  * currently holds for it) both derive from the feed alone — pre-images
  * carry the old value, post-images the new — so refresh cost tracks
  * the change rate, never the base or index size. Exactly-once via the
  * index table's own replay ledger, the [[MaterializedView]] discipline
  * (deletions of emptied values run BEFORE the marker-carrying merge).
  *
  * NULL values are not indexed (standard index semantics: an `=`
  * predicate never matches NULL); for a COMPOSITE index a row is
  * indexed iff every component is non-NULL. Composite index tables
  * store the value columns plus a synthetic manifest key
  * ([[DerivedTable.KeyCol]], the injective tuple encoding) and key on
  * that; single-column indexes keep the value column itself as the key
  * — their on-disk layout is unchanged from before composite support.
  * Key lists are SORTED, so the index contents are deterministic and
  * engine-reproducible. */
object SecondaryIndex {

  val StreamId = "secondary-index"

  /** The token space refresh's emptied-value deletions commit under —
    * separate from user deletes' `lastDelete` space. */
  val DeleteStream: String = DerivedTable.deleteStream(StreamId)

  /** `rangeLayout = true` lays the index table out by RANGE on the
    * (single, string-typed) value column instead of hash: boundaries
    * are sampled from the bootstrap distribution at [[create]], each
    * index bucket holds a contiguous slice of the value space, and
    * `value BETWEEN a AND b` becomes a bucket-pruned scan
    * ([[lookupRange]]) — the classic sorted secondary index. Point
    * lookups, refresh and the whole maintenance protocol are layout-
    * agnostic (bucket targeting routes through the manifest's recorded
    * layout), so everything else behaves identically. */
  final case class Index(
      baseRoot: String,
      baseSchema: StructType,
      baseKey: String,
      indexRoot: String,
      valueCols: Seq[String],
      numBuckets: Int = 16,
      rangeLayout: Boolean = false) {
    require(valueCols.nonEmpty, "need at least one value column")
    require(!rangeLayout || valueCols.size == 1,
      "range layout is single-value-column only")
    require(!rangeLayout || baseSchema(valueCols.head).dataType ==
        org.apache.spark.sql.types.StringType,
      "range layout requires a STRING value column (its rendering IS " +
        "the range order; pre-encode numerics order-preservingly in a " +
        "derived base column)")
  }

  object Index {
    /** Single-value-column convenience, the pre-composite shape. */
    def apply(baseRoot: String, baseSchema: StructType, baseKey: String,
        indexRoot: String, valueCol: String, numBuckets: Int): Index =
      Index(baseRoot, baseSchema, baseKey, indexRoot, Seq(valueCol),
        numBuckets)
  }

  private def composite(ix: Index): Boolean = ix.valueCols.size > 1

  /** The index table's manifest key column. */
  private def keyCol(ix: Index): String =
    if (composite(ix)) DerivedTable.KeyCol else ix.valueCols.head

  /** Appends the synthetic key column for composite indexes. */
  private def withKey(ix: Index, df: DataFrame): DataFrame =
    if (!composite(ix)) df
    else df.withColumn(DerivedTable.KeyCol,
      DerivedTable.encodeKey(ix.valueCols.map(col)))

  /** The indexed-value tuple as ONE column: the value itself when
    * single, a struct of the components (NULL when any component is
    * NULL — such rows are unindexed) when composite. */
  private def valueExpr(ix: Index): Column =
    if (!composite(ix)) col(ix.valueCols.head)
    else when(ix.valueCols.map(col(_).isNotNull).reduce(_ && _),
      struct(ix.valueCols.map(col): _*))

  /** The encoded probe/manifest key of a `_v`-shaped column. */
  private def encOf(ix: Index, c: Column): Column =
    if (!composite(ix)) c
    else DerivedTable.encodeKey(ix.valueCols.map(f => c.getField(f)))

  private def grouped(base: DataFrame, ix: Index): DataFrame =
    base.filter(ix.valueCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(ix.valueCols.map(col): _*)
      .agg(sort_array(collect_list(col(ix.baseKey))).as("keys"))

  /** Range-layout boundaries from the bootstrap value distribution: a
    * DETERMINISTIC bounded sample (the `sampleCap` hash-smallest
    * rendered values — a TakeOrdered, never a full sort or an unbounded
    * collect) quantiled into numBuckets even slices. The same strategy
    * Spark's own RangePartitioner uses (sample, then split), sized so
    * driver memory stays bounded at any index cardinality; a skewed or
    * drifted distribution re-balances via [[ManifestTable.rebucket]]
    * with fresh bounds. */
  private def sampleBounds(
      full: DataFrame, ix: Index, sampleCap: Int = 100000): Seq[String] = {
    val rendered = col(ix.valueCols.head).cast("string")
    val arr = full.select(rendered.as("r")).filter(col("r").isNotNull)
      .orderBy(xxhash64(col("r")), col("r")).limit(sampleCap)
      .collect().map(_.getString(0)).sorted
    require(arr.nonEmpty,
      "range layout needs at least one non-NULL indexed value at create")
    (1 until ix.numBuckets)
      .map(i => arr((i.toLong * arr.length / ix.numBuckets).toInt))
  }

  /** Bootstraps the index from the base's current version. Returns the
    * captured base version. */
  def create(spark: SparkSession, ix: Index): Long = {
    val cur = ManifestTable.currentVersion(spark, ix.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${ix.baseRoot}"))
    val full = grouped(
      ManifestTable.readAt(spark, ix.baseRoot, ix.baseSchema, cur), ix)
    val bounds = if (ix.rangeLayout) sampleBounds(full, ix) else Nil
    DerivedTable.bootstrap(spark, withKey(ix, full), keyCol(ix),
      ix.indexRoot, ix.numBuckets, StreamId, cur, rangeBounds = bounds)
    cur
  }

  /** The index table's STORED schema (incl. the synthetic key column of
    * a composite index). Plan-time only, and metadata-free: built over
    * an empty LOCAL frame of the declared base schema — no manifest
    * read, no data read. */
  private def indexSchema(spark: SparkSession, ix: Index): StructType = {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      ix.baseSchema)
    withKey(ix, grouped(empty, ix)).schema
  }

  /** The committed (value columns, sorted keys) index contents (the
    * synthetic key column of a composite index is dropped). */
  def read(spark: SparkSession, ix: Index): DataFrame =
    ManifestTable.read(spark, ix.indexRoot, indexSchema(spark, ix))
      .drop(DerivedTable.KeyCol)

  /** How far the index has applied the base's history. */
  def appliedVersion(spark: SparkSession, ix: Index): Long =
    DerivedTable.appliedVersion(spark, ix.indexRoot, StreamId)

  /** Advances the index to the base's current version. Returns the new
    * applied version, or None when already current. */
  def refresh(spark: SparkSession, ix: Index): Option[Long] = {
    val cur = ManifestTable.currentVersion(spark, ix.baseRoot).getOrElse(
      throw new IllegalStateException(s"no base table at ${ix.baseRoot}"))
    val seen = appliedVersion(spark, ix)
    if (cur <= seen) return None
    val schema = indexSchema(spark, ix)
    val key = keyCol(ix)
    val m = DerivedTable.identityMapping(schema, key)
    // Persisted: the feed backs the touched collect, the kept-values
    // collect and the merge write — one diff join, not three.
    val feed = ManifestTable.changes(spark, ix.baseRoot, ix.baseSchema,
      ix.baseKey, seen, cur)
      .select(col(ix.baseKey).as("_k"), valueExpr(ix).as("_v"),
        col("_change_type").as("_t"), col("_version").as("_ver"))
      .persist()
    try {
    // Window-FINAL assignment per affected key: the state-carrying row
    // at the key's highest version (post/insert outranks delete
    // outranks pre within a commit). NULL = the key ends unindexed.
    val postRank = when(col("_t").isin("insert", "update_postimage"),
      lit(2)).when(col("_t") === "delete", lit(1)).otherwise(lit(0))
    val finalSt = feed.groupBy(col("_k"))
      .agg(max_by(struct(col("_t"), col("_v")),
        struct(col("_ver"), postRank)).as("_f"))
      .select(col("_k"),
        when(col("_f._t").isin("insert", "update_postimage"),
          col("_f._v")).as("_newv"))
    // Window-START assignment: the key's value the index currently
    // holds = the earliest pre-image/delete value (an insert-first key
    // was never indexed). Pre outranks delete outranks insert here.
    val preRank = when(col("_t") === "update_preimage", lit(0))
      .when(col("_t") === "delete", lit(1)).otherwise(lit(2))
    val oldSt = feed.groupBy(col("_k"))
      .agg(min_by(struct(col("_t"), col("_v")),
        struct(col("_ver"), preRank)).as("_o"))
      .select(col("_k"),
        when(col("_o._t").isin("delete", "update_preimage"),
          col("_o._v")).as("_oldv"))
    // Touched values — bounded by the change rate. Collected as the
    // ENCODED probe key (raw value for single-column indexes), the
    // form every lookup/delete below consumes.
    val touched = finalSt.select(col("_newv").as("_v"))
      .unionByName(oldSt.select(col("_oldv").as("_v")))
      .filter(col("_v").isNotNull)
      .select(encOf(ix, col("_v")).as("_p")).distinct().collect()
      .map(_.get(0)).toSeq
    if (touched.isEmpty) {
      DerivedTable.advanceMarker(spark, ix.indexRoot, schema,
        key, StreamId, cur)
      return Some(cur)
    }
    // New key lists for the touched values: the current lists minus the
    // affected keys, plus each affected key's final assignment.
    //
    // CRASH-SAFETY INVARIANT (why reading the CURRENT index state is
    // sound here, where MaterializedView must read its marker
    // snapshot): the only pre-marker write a crashed refresh can leave
    // behind is the delete of EMPTIED values — and a value empties only
    // when every one of its member keys was affected, i.e. every one
    // has a pre-image (or delete) in the retry's feed window. Affected
    // keys are excluded from oldPairs and fully re-derived from the
    // feed, so the missing index row contributes nothing that is not
    // reconstructed. Any future pre-marker write that is NOT such a
    // delete (partial deletes, eager row updates) breaks this invariant
    // and must switch this read to DerivedTable.markerVersion.
    val affected = broadcast(finalSt.select(col("_k")))
    val oldPairs = ManifestTable.lookup(spark, ix.indexRoot, schema,
        key, touched)
      .select(valueExpr(ix).as("_v"), explode(col("keys")).as("_k"))
      .join(affected, Seq("_k"), "left_anti")
    val newPairs = oldPairs.unionByName(
      finalSt.filter(col("_newv").isNotNull)
        .select(col("_newv").as("_v"), col("_k")))
    val regroupedV = newPairs.groupBy(col("_v"))
      .agg(sort_array(collect_list(col("_k"))).as("keys"))
    // Unpack the tuple back into the stored per-component columns.
    val regrouped = withKey(ix,
      if (!composite(ix))
        regroupedV.select(col("_v").as(ix.valueCols.head), col("keys"))
      else regroupedV.select(ix.valueCols.map(f =>
        col("_v").getField(f).as(f)) :+ col("keys"): _*))
    val keptVals = regrouped.select(col(key)).collect()
      .map(_.get(0)).toSet
    val emptied = touched.filterNot(keptVals)
    if (emptied.nonEmpty)
      ManifestTable.delete(spark, ix.indexRoot, schema, key,
        emptied, token = cur, tokenStream = Some(DeleteStream))
    ManifestTable.merge(m.project(regrouped), cur, m, ix.indexRoot,
      schema, streamId = StreamId)
    Some(cur)
    } finally feed.unpersist()
  }

  /** Encodes caller-supplied probe tuples to manifest-key probes: raw
    * values pass through for a single-column index; for a composite
    * index each probe is a Seq of component values, encoded through the
    * SAME Spark expression the index rows use (a tiny local frame — no
    * hand-rolled driver-side reimplementation to drift). */
  private def probeKeys(
      spark: SparkSession, ix: Index, values: Seq[Any]): Seq[Any] = {
    if (!composite(ix)) values
    else {
      val vSchema = StructType(ix.valueCols.map(f =>
        ix.baseSchema(f).copy(nullable = true)))
      val rows = values.map {
        case s: Seq[_] =>
          require(s.size == ix.valueCols.size,
            s"probe arity ${s.size} != ${ix.valueCols.size} value cols")
          org.apache.spark.sql.Row(s: _*)
        case other => throw new IllegalArgumentException(
          s"composite index probe must be a Seq of " +
            s"${ix.valueCols.size} component values, got $other")
      }
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), vSchema)
        .select(DerivedTable.encodeKey(ix.valueCols.map(col)).as("_p"))
        .collect().map(_.get(0)).toSeq
    }
  }

  /** Pruned multi-value point lookup on the index alone: reads only the
    * probed values' index buckets and explodes to (value, key) pairs —
    * the bounded read a fixed probe set wants, without touching the
    * base table. For a composite index each probe is a Seq of
    * component values. */
  def lookupValues(spark: SparkSession, ix: Index, values: Seq[Any])
      : DataFrame = {
    val schema = indexSchema(spark, ix)
    ManifestTable.lookup(spark, ix.indexRoot, schema, keyCol(ix),
        probeKeys(spark, ix, values))
      .select(ix.valueCols.map(col) :+
        explode(col("keys")).as(ix.baseKey): _*)
  }

  /** Point query on the indexed column(s): index lookup → keys → base
    * lookup. Two pruned reads on the common (selective) path; the
    * key-list collect is CAPPED at `maxDriverKeys` — a heavily-skewed
    * value whose list exceeds it must not turn the lookup into an
    * unbounded driver collect, so it degrades to a DISTRIBUTED
    * semi-join of the exploded key frame against the base scan instead.
    * That fallback is the right plan at that selectivity anyway:
    * millions of keys hash across ~every bucket, so the "pruned" read
    * would have touched the whole table regardless. For a composite
    * index pass a Seq of component values. */
  def lookupBy(spark: SparkSession, ix: Index, value: Any,
      maxDriverKeys: Int = 100000): DataFrame = {
    val schema = indexSchema(spark, ix)
    // 0 or 1 rows by construction — the bounded probe is the list SIZE,
    // never the list itself.
    val hit = ManifestTable.lookup(spark, ix.indexRoot, schema,
      keyCol(ix), probeKeys(spark, ix, Seq(value)))
    fetchBase(spark, ix, hit, maxDriverKeys)
  }

  /** Range query on a single-column index: `lo <= value <= hi`
    * (inclusive), resolved as a PRUNED index range scan
    * ([[ManifestTable.lookupRange]] — on a `rangeLayout` index only the
    * buckets overlapping [lo, hi] are read) followed by the same
    * capped-collect-or-semi-join base fetch as [[lookupBy]]. A wide
    * range whose key union exceeds `maxDriverKeys` degrades to the
    * distributed semi-join — the right plan at that selectivity. */
  def lookupRange(spark: SparkSession, ix: Index, lo: Any, hi: Any,
      maxDriverKeys: Int = 100000): DataFrame = {
    require(!composite(ix), "range lookup is single-value-column only")
    val schema = indexSchema(spark, ix)
    val hit = ManifestTable.lookupRange(spark, ix.indexRoot, schema,
      keyCol(ix), lo, hi)
    fetchBase(spark, ix, hit, maxDriverKeys)
  }

  /** Index rows → base rows: collects the matched key lists when their
    * total size fits `maxDriverKeys` (two pruned reads), else joins the
    * exploded key frame against the base scan — a heavily-skewed value
    * set must not become an unbounded driver collect, and at that
    * cardinality the keys hash across ~every bucket anyway. */
  private def fetchBase(spark: SparkSession, ix: Index, hit: DataFrame,
      maxDriverKeys: Int): DataFrame = {
    hit.persist()
    try {
      val nKeys = hit.select(size(col("keys")).as("n")).collect()
        .map(_.getInt(0).toLong).sum
      if (nKeys == 0)
        ManifestTable.read(spark, ix.baseRoot, ix.baseSchema).limit(0)
      else if (nKeys <= maxDriverKeys) {
        val keys = hit.select(explode(col("keys")).as("_k")).collect()
          .map(_.get(0)).toSeq
        ManifestTable.lookup(spark, ix.baseRoot, ix.baseSchema,
          ix.baseKey, keys)
      } else {
        val keyFrame = hit.select(explode(col("keys")).as(ix.baseKey))
          .repartition(spark.sessionState.conf.numShufflePartitions)
        ManifestTable.read(spark, ix.baseRoot, ix.baseSchema)
          .join(keyFrame, Seq(ix.baseKey), "left_semi")
      }
    } finally hit.unpersist()
  }
}
