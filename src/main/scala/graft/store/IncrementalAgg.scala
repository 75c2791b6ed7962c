package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate MATERIALIZED VIEW over
  * a [[ManifestTable]], driven by its change feed: the view updates by
  * reading only the rows the table's commits touched
  * ([[ManifestTable.changes]] already reads only commit-touched buckets),
  * never re-scanning the base table — the classic lakehouse
  * materialized-view discipline, where refresh cost tracks the CHANGE
  * RATE, not the table size. At 100 TB with a per-mille daily churn the
  * refresh reads gigabytes, not the table.
  *
  * The self-inverse aggregates — `n_rows` (count) and per-column sums —
  * maintain from the feed alone: insert/update_postimage contribute
  * +1/+x, delete/update_preimage contribute −1/−x (averages derive as
  * sum/n at read time). Min/max are NOT self-inverse — a delete of the
  * attaining row can't be undone from the feed — so `minMaxCols`
  * maintenance re-reads exactly the groups the feed shows LOST an
  * extremal row (see [[applyChanges]]); all other groups maintain
  * feed-only. NULL values count 0 toward sums (document
  * or pre-`coalesce` if SQL-null-sum semantics matter); groups whose
  * count reaches 0 leave the view. Pass EXACT-addition column types
  * (integers, DECIMAL) for sums: float addition is order-sensitive, so
  * cast doubles to DECIMAL first and back at read time if needed.
  */
object IncrementalAgg {

  /** Ground-truth / bootstrap aggregate of a snapshot: one hash aggregate
    * producing `groupCols`, `n_rows`, `sum_<c>` per sum column and
    * `min_<c>`/`max_<c>` per min/max column (SQL semantics: NULLs
    * ignored, all-NULL group → NULL). */
  def fullAgg(
      snapshot: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val aggs = sumCols.map(c => sum(coalesce(col(c),
        lit(0).cast(snapshot.schema(c).dataType))).as(s"sum_$c")) ++
      minMaxCols.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Applies a change-feed window to a maintained view: returns the view
    * as of the feed's end version. `view` must be a [[fullAgg]]-shaped
    * frame (or a previous applyChanges output); `feed` a
    * [[ManifestTable.changes]] output over the base schema. One bounded
    * aggregate over the feed + one join against the view — the base
    * table is never read for counts and sums.
    *
    * With `minMaxCols`, min/max are maintained too — the non-self-inverse
    * aggregates. Inserts only IMPROVE an extremum (`least`/`greatest`
    * against the insert-side extremes, no re-read); a group needs a
    * PARTIAL RECOMPUTE only when the feed deleted a value that ties or
    * beats the group's candidate extremum — the delete may have removed
    * the attaining row. Exactly those SUSPECT groups are re-read from
    * `snapshot` (the base at the feed's END version, passed lazily and
    * never evaluated when no group is suspect) through a broadcast
    * semi-join, so the re-read cost tracks the number of groups that
    * LOST an extremal row, not the table or even the view size. With
    * `minMaxCols` this runs ONE bounded action at call time (the
    * suspect-key collect — bounded by feed-touched groups; callers
    * whose feed may touch unboundedly many groups pass
    * `suspectsBounded = false` and the keys stay distributed, the
    * recompute running through a distributed semi-join instead of a
    * broadcast literal frame); without, it stays a pure plan
    * builder. */
  def applyChanges(
      view: DataFrame,
      feed: DataFrame,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil,
      snapshot: () => DataFrame = null,
      suspectsBounded: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(minMaxCols.isEmpty || snapshot != null,
      "min/max maintenance needs the end-version snapshot for the " +
        "lost-extremum partial recompute")
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val valueCols = (sumCols ++ minMaxCols).distinct
    val aggs = sumCols.map(c => sum(
        coalesce(col(c), lit(0).cast(feed.schema(c).dataType)) *
          col("_sign")).as(s"_d_$c")) ++
      minMaxCols.flatMap(c => Seq(
        min(when(col("_sign") === 1L, col(c))).as(s"_imin_$c"),
        max(when(col("_sign") === 1L, col(c))).as(s"_imax_$c"),
        min(when(col("_sign") === -1L, col(c))).as(s"_dmin_$c"),
        max(when(col("_sign") === -1L, col(c))).as(s"_dmax_$c")))
    val deltas = feed
      .select((groupCols ++ valueCols).map(col) :+ sign.as("_sign"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("_sign")).as("_dn"), aggs: _*)
    // NULL-safe join on the group key: a NULL group is a real group.
    val v = view.alias("v")
    val d = deltas.alias("d")
    val cond = groupCols.map(g => v(g) <=> d(g)).reduce(_ && _)
    // candidate extremum = old extremum improved by the inserts (least/
    // greatest skip NULLs); the candidate is WRONG only if a deleted
    // value ties or beats it — the suspect condition below.
    val candMin = minMaxCols.map(c => least(v(s"min_$c"), d(s"_imin_$c")))
    val candMax =
      minMaxCols.map(c => greatest(v(s"max_$c"), d(s"_imax_$c")))
    val suspect =
      if (minMaxCols.isEmpty) lit(false)
      else minMaxCols.zipWithIndex.map { case (c, i) =>
        coalesce(d(s"_dmin_$c") <= candMin(i), lit(false)) ||
          coalesce(d(s"_dmax_$c") >= candMax(i), lit(false))
      }.reduce(_ || _)
    val maintained = v.join(d, cond, "full_outer")
      .select(
        groupCols.map(g => coalesce(v(g), d(g)).as(g)) ++
          Seq((coalesce(v("n_rows"), lit(0L)) +
            coalesce(d("_dn"), lit(0L))).as("n_rows")) ++
          sumCols.map { c =>
            val z = lit(0).cast(view.schema(s"sum_$c").dataType)
            (coalesce(v(s"sum_$c"), z) + coalesce(d(s"_d_$c"), z))
              .as(s"sum_$c")
          } ++
          minMaxCols.zipWithIndex.flatMap { case (c, i) =>
            Seq(candMin(i).as(s"min_$c"), candMax(i).as(s"max_$c"))
          } :+ suspect.as("_suspect"): _*)
      .filter(col("n_rows") > 0)
    if (minMaxCols.isEmpty) maintained.drop("_suspect")
    else {
      if (suspectsBounded) {
        // ONE bounded action: collect the suspect group keys (bounded
        // by feed-touched groups, i.e. the change rate — the caller
        // certifies that fits the driver; MaterializedView gates this
        // flag on its own maxDriverKeys touched count). The collected
        // keys ride the final plan as a broadcast literal frame, so the
        // view⋈deltas join executes exactly once more when the result
        // is consumed — not once per branch (isEmpty / broadcast build
        // / !_suspect filter would each have re-run it).
        val suspectRows = maintained.filter(col("_suspect"))
          .select(groupCols.map(col): _*).collect()
        if (suspectRows.isEmpty) maintained.drop("_suspect")
        else {
          val gSchema = org.apache.spark.sql.types.StructType(
            groupCols.map(g => view.schema(g).copy(nullable = true)))
          val k = broadcast(view.sparkSession.createDataFrame(
            java.util.Arrays.asList(suspectRows: _*), gSchema)).alias("k")
          val snap = snapshot().alias("s")
          val semiCond = groupCols
            .map(g => snap(g) <=> k(g)).reduce(_ && _)
          val recomputed = fullAgg(snap.join(k, semiCond, "left_semi"),
            groupCols, sumCols, minMaxCols)
          val m = maintained.drop("_suspect").alias("m")
          val antiCond = groupCols.map(g => m(g) <=> k(g)).reduce(_ && _)
          m.join(k, antiCond, "left_anti").unionByName(recomputed)
        }
      } else {
        // Unbounded change rate (a bulk backfill): the suspect keys
        // stay DISTRIBUTED — materialize them once on the executors
        // (localCheckpoint: eager, and cuts the lineage so joining
        // them back against plans derived from `maintained` is not a
        // self-join), recompute exactly the suspect groups from the
        // snapshot through a distributed semi-join, and keep every
        // other maintained group via the _suspect flag itself. Same
        // two executions of the view⋈deltas join as the literal path
        // (one for the key materialization, one at consumption), zero
        // unbounded driver state. A lost executor invalidates the
        // checkpoint and fails the job — a refresh is retryable, so
        // that is the right trade at this scale.
        val kFrame = maintained.filter(col("_suspect"))
          .select(groupCols.map(g => col(g).as(s"_sk_$g")): _*)
          .localCheckpoint()
        if (kFrame.isEmpty) maintained.drop("_suspect")
        else {
          val snap = snapshot().alias("s")
          val semiCond = groupCols
            .map(g => snap(g) <=> kFrame(s"_sk_$g")).reduce(_ && _)
          val recomputed = fullAgg(
            snap.join(kFrame, semiCond, "left_semi"),
            groupCols, sumCols, minMaxCols)
          maintained.filter(!col("_suspect")).drop("_suspect")
            .unionByName(recomputed)
        }
      }
    }
  }

  /** One step of a FOLLOWER loop: advances a maintained view from its
    * recorded version to the table's current one purely from the feed,
    * returning the refreshed view and the version it now reflects (the
    * state to carry into the next poll). No commits since last poll →
    * the same state comes back untouched (zero work beyond the version
    * probe). This is the driver loop a periodic refresh job or a
    * foreachBatch hook runs: poll, refresh, publish. */
  def refresh(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      keyColumn: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      state: (DataFrame, Long),
      prep: DataFrame => DataFrame = identity,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity,
      minMaxCols: Seq[String] = Nil): (DataFrame, Long) = {
    val (view, seen) = state
    ManifestTable.currentVersion(spark, root) match {
      case Some(cur) if cur > seen =>
        val feed = prep(ManifestTable.changes(spark, root, schema,
          keyColumn, seen, cur, keyComparator))
        (applyChanges(view, feed, groupCols, sumCols, minMaxCols,
          () => prep(ManifestTable.readAt(spark, root, schema, cur))),
          cur)
      case _ => state
    }
  }

  /** Convenience: bootstrap the view at `fromVersion` and maintain it to
    * `toVersion` purely from the feed — the shape a periodic refresh job
    * runs. `prep` transforms both the snapshot and the feed rows before
    * aggregation (e.g. casting a double to DECIMAL for exact sums). */
  def maintainedView(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      schema: org.apache.spark.sql.types.StructType,
      keyColumn: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      fromVersion: Long,
      toVersion: Long,
      prep: DataFrame => DataFrame = identity,
      keyComparator: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        identity,
      minMaxCols: Seq[String] = Nil): DataFrame = {
    val base = fullAgg(
      prep(ManifestTable.readAt(spark, root, schema, fromVersion)),
      groupCols, sumCols, minMaxCols)
    val feed = prep(ManifestTable.changes(spark, root, schema, keyColumn,
      fromVersion, toVersion, keyComparator))
    applyChanges(base, feed, groupCols, sumCols, minMaxCols,
      () => prep(ManifestTable.readAt(spark, root, schema, toVersion)))
  }
}
