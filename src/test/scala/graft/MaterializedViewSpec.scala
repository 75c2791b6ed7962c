package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{IncrementalAgg, ManifestTable, MaterializedView}

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def mapping = {
    val m = new Mapping()
    m.auto("id"); m.auto("grp"); m.auto("v")
    m.complete(schema)
    m
  }

  private def raw(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, g, v), i) => (Seq(id.toString, g, v), i.toLong) }
      .toDF("_raw", "_line")

  private def fresh(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def vOf(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
      r.getAs[Number](4).longValue)).toSet

  private def viewDef(base: String, view: String) = MaterializedView.View(
    baseRoot = base, baseSchema = schema, baseKey = "id",
    viewRoot = view, groupCols = Seq("grp"), sumCols = Seq("v"),
    minMaxCols = Seq("v"), numBuckets = 4)

  test("persistent view tracks the base across merges and deletes, " +
      "hash-equal to a full recompute at every step") {
    val base = fresh("mv_base"); val view = fresh("mv_view")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "10"), (2L, "a", "5"),
      (3L, "b", "7"), (4L, "c", "1")).transform(m.project),
      0L, m, base, schema, numBuckets = 4, streamId = "S")
    val vd = viewDef(base, view)
    val captured = MaterializedView.create(spark, vd)
    def recompute() = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, base, schema), Seq("grp"), Seq("v"),
      Seq("v"))
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()))
    assert(MaterializedView.appliedVersion(spark, vd) == captured)

    // merge: moves id 2 a→b (group a LOSES its min 5 — suspect path),
    // creates id 5
    ManifestTable.merge(raw((2L, "b", "20"), (5L, "a", "2"))
      .transform(m.project), 1L, m, base, schema, streamId = "S")
    assert(MaterializedView.refresh(spark, vd).isDefined)
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()),
      "after update-heavy merge")

    // delete erases group c entirely: the group must LEAVE the table
    ManifestTable.delete(spark, base, schema, "id", Seq(4L), token = 9L)
    assert(MaterializedView.refresh(spark, vd).isDefined)
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()),
      "after group-erasing delete")
    assert(!MaterializedView.read(spark, vd).collect()
      .exists(_.getString(0) == "c"), "vanished group must leave")

    // already current → no-op; a replayed refresh must not corrupt
    assert(MaterializedView.refresh(spark, vd).isEmpty)
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()))
  }

  test("a refresh that crashed after its deletions replays correctly " +
      "even when the base advanced in between") {
    // The hard interleaving: refresh deletes a vanished group from the
    // view table, crashes BEFORE the marker-carrying merge, and the
    // base then re-inserts a row of that group. The retry's feed window
    // covers both base commits, but the view's CURRENT state already
    // lost the group — applying the window's net delta to it would
    // drop the re-inserted group (n = 0 - 2 + 1 ≤ 0). The retry must
    // read the touched groups from the view's snapshot AT the marker.
    val base = fresh("mv_base_crash"); val view = fresh("mv_view_crash")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "c", "3"),
      (3L, "c", "4")).transform(m.project),
      0L, m, base, schema, numBuckets = 2, streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    val vSchema = MaterializedView.read(spark, vd).schema
    // base commit 1: group c loses BOTH rows
    ManifestTable.delete(spark, base, schema, "id", Seq(2L, 3L),
      token = 9L)
    // simulate the crashed refresh: exactly its group deletion (same
    // token = the base version it was applying, in the refresh's own
    // token space), no marker merge
    val crashedCur = ManifestTable.currentVersion(spark, base).get
    ManifestTable.delete(spark, view, vSchema, "grp", Seq("c"),
      token = crashedCur,
      tokenStream = Some(MaterializedView.DeleteStream))
    // base commit 2 (after the crash): group c comes BACK
    ManifestTable.merge(raw((4L, "c", "7")).transform(m.project),
      1L, m, base, schema, streamId = "S")
    // the retried refresh must land on the recompute, c included
    assert(MaterializedView.refresh(spark, vd).isDefined)
    val recomputed = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, base, schema), Seq("grp"), Seq("v"),
      Seq("v"))
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recomputed),
      s"crash-retry lost the re-inserted group: " +
        s"${vOf(MaterializedView.read(spark, vd))} vs " +
        s"${vOf(recomputed)}")
  }

  test("refresh deletions live in their own token space: a user delete " +
      "with a numerically-equal token still applies") {
    val base = fresh("mv_base_tok"); val view = fresh("mv_view_tok")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "c", "3"))
      .transform(m.project), 0L, m, base, schema, numBuckets = 2,
      streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    val vSchema = MaterializedView.read(spark, vd).schema
    // base loses group c → refresh issues a vanished-group delete whose
    // token is the base version (here: 1)
    ManifestTable.delete(spark, base, schema, "id", Seq(2L), token = 9L)
    val cur = ManifestTable.currentVersion(spark, base).get
    assert(MaterializedView.refresh(spark, vd).contains(cur))
    assert(ManifestTable.currentManifest(spark, view).get.lastBatches
      .get(MaterializedView.DeleteStream).contains(cur),
      "refresh delete must record under its own stream")
    // a USER delete on the view root with the SAME numeric token must
    // not be swallowed as a replay of the refresh's delete
    ManifestTable.delete(spark, view, vSchema, "grp", Seq("a"),
      token = cur)
    assert(ManifestTable.read(spark, view, vSchema).count() == 0L,
      "user delete with a token equal to the refresh token was " +
        "silently swallowed")
  }

  test("markerVersion fails loudly when a crash is in flight and " +
      "vacuum retired the marker snapshot") {
    val base = fresh("mv_base_vac"); val view = fresh("mv_view_vac")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "c", "3"))
      .transform(m.project), 0L, m, base, schema, numBuckets = 2,
      streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    val vSchema = MaterializedView.read(spark, vd).schema
    ManifestTable.delete(spark, base, schema, "id", Seq(2L), token = 9L)
    // crashed refresh: its vanished-group delete committed, no marker
    // merge — then an (operator-error) default vacuum retires the
    // pre-crash view manifests
    val crashedCur = ManifestTable.currentVersion(spark, base).get
    ManifestTable.delete(spark, view, vSchema, "grp", Seq("c"),
      token = crashedCur,
      tokenStream = Some(MaterializedView.DeleteStream))
    ManifestTable.vacuum(spark, view, keepLast = 1)
    val e = intercept[IllegalStateException] {
      MaterializedView.refresh(spark, vd)
    }
    assert(e.getMessage.contains("vacuum") &&
      e.getMessage.contains("crash"),
      s"expected the loud vacuumed-marker failure, got: ${e.getMessage}")
  }

  test("create rejects NULL groups up front instead of silently " +
      "dropping them") {
    val base = fresh("mv_base_null"); val view = fresh("mv_view_null")
    val m = mapping
    // id 2's grp is EMPTY → projected NULL
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "", "2"))
      .transform(m.project), 0L, m, base, schema, numBuckets = 2,
      streamId = "S")
    val e = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, viewDef(base, view))
    }
    assert(e.getMessage.contains("NULL"))
    // prep-side coalesce is the documented path and works
    val vd = viewDef(base, fresh("mv_view_null_ok")).copy(prep = df =>
      df.withColumn("grp", coalesce(col("grp"), lit("(none)"))))
    MaterializedView.create(spark, vd)
    assert(MaterializedView.read(spark, vd).collect()
      .map(_.getString(0)).toSet == Set("a", "(none)"))
  }

  test("refresh writes only the touched groups' buckets") {
    val base = fresh("mv_base_slim"); val view = fresh("mv_view_slim")
    val m = mapping
    // 40 groups spread over the view's 4 buckets
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"g$i", i.toString)): _*)
        .transform(m.project),
      0L, m, base, schema, numBuckets = 4, streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    val before = ManifestTable.currentManifest(spark, view).get.entries
      .map(e => e.bucket -> e.relPath).toMap
    // touch ONE group
    ManifestTable.merge(raw((1L, "g1", "100")).transform(m.project),
      1L, m, base, schema, streamId = "S")
    assert(MaterializedView.refresh(spark, vd).isDefined)
    val after = ManifestTable.currentManifest(spark, view).get.entries
      .map(e => e.bucket -> e.relPath).toMap
    val changed = after.count { case (b, p) => before.get(b) != Some(p) }
    assert(changed == 1,
      s"one touched group must rewrite exactly its bucket: $changed")
    assert(vOf(MaterializedView.read(spark, vd)) ==
      vOf(IncrementalAgg.fullAgg(
        ManifestTable.read(spark, base, schema), Seq("grp"), Seq("v"),
        Seq("v"))))
  }

  test("continuous-import follower: view AND secondary index stay " +
      "consistent after every delta-mode micro-batch") {
    // The full pipeline composition: StreamingImport's micro-batches
    // land in the base as LSM delta merges (with periodic compaction),
    // and after each batch both derived tables refresh from the CDC
    // feed — each refresh must land exactly on the full recompute.
    val base = fresh("mv_follow_base"); val view = fresh("mv_follow_view")
    val idx = fresh("mv_follow_idx")
    val m = mapping
    graft.streaming.StreamingImport.applyBatch(
      raw((1L, "a", "1"), (2L, "b", "2"), (3L, "a", "3")),
      0L, m, base, schema, numBuckets = 4, streamId = "F",
      delta = true, compactEvery = 2)
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    // the index rides SHARDED here: the follower loop must hold with
    // hot-value sub-bucketing under delta merges + compaction too
    val ix = graft.store.SecondaryIndex.Index(base, schema, "id", idx,
      Seq("grp"), numBuckets = 4, numShards = 4)
    graft.store.SecondaryIndex.create(spark, ix)
    val batches = Seq(
      Seq((1L, "b", "10"), (4L, "c", "4")), // move + insert
      Seq((2L, "b", "20"), (5L, "a", "5")), // update in place + insert
      Seq((3L, "c", "30"), (1L, "a", "11")), // two moves (one back)
      Seq((4L, "c", "40"))) // update in place
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingImport.applyBatch(
        raw(b: _*), i + 1L, m, base, schema, streamId = "F",
        delta = true, compactEvery = 2)
      assert(MaterializedView.refresh(spark, vd).isDefined)
      assert(graft.store.SecondaryIndex.refresh(spark, ix).isDefined)
      val recomputed = IncrementalAgg.fullAgg(
        ManifestTable.read(spark, base, schema), Seq("grp"), Seq("v"),
        Seq("v"))
      assert(vOf(MaterializedView.read(spark, vd)) == vOf(recomputed),
        s"view diverged after batch ${i + 1}")
      val idxContents = graft.store.SecondaryIndex.read(spark, ix)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val idxExpected = ManifestTable.read(spark, base, schema)
        .collect().map(r => (r.getString(1), r.getLong(0)))
        .groupBy(_._1).map { case (g, ks) =>
          (g, ks.map(_._2).toSeq.sorted) }
      assert(idxContents == idxExpected,
        s"index diverged after batch ${i + 1}")
    }
  }

  test("multi-column group: refresh, cross-group moves and vanished " +
      "composite groups land on the full recompute") {
    val schema2 = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("sub", StringType), StructField("v", LongType)))
    val m2 = new Mapping()
    m2.auto("id"); m2.auto("grp"); m2.auto("sub"); m2.auto("v")
    m2.complete(schema2)
    def raw2(rows: (Long, String, String, Long)*): DataFrame =
      rows.zipWithIndex.map { case ((id, g, s, v), i) =>
        (Seq(id.toString, g, s, v.toString), i.toLong) }
        .toDF("_raw", "_line")
    val base = fresh("mv_base_multi"); val view = fresh("mv_view_multi")
    ManifestTable.merge(raw2((1L, "a", "x", 10L), (2L, "a", "y", 5L),
      (3L, "b", "x", 7L), (4L, "b", "y", 1L)).transform(m2.project),
      0L, m2, base, schema2, numBuckets = 4, streamId = "S")
    val vd = MaterializedView.View(
      baseRoot = base, baseSchema = schema2, baseKey = "id",
      viewRoot = view, groupCols = Seq("grp", "sub"),
      sumCols = Seq("v"), minMaxCols = Seq("v"), numBuckets = 4)
    MaterializedView.create(spark, vd)
    def recompute() = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, base, schema2), Seq("grp", "sub"),
      Seq("v"), Seq("v"))
    def asSet(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Number](3).longValue, r.getAs[Number](4).longValue,
        r.getAs[Number](5).longValue)).toSet
    // the read surface hides the synthetic key column
    assert(MaterializedView.read(spark, vd).columns.toSeq ==
      recompute().columns.toSeq,
      "synthetic composite key column leaked into the read surface")
    assert(asSet(MaterializedView.read(spark, vd)) == asSet(recompute()))
    // move id 2 (a,y)→(b,x) — (a,y) VANISHES, (b,x) gains — and id 1
    // loses (a,x)'s max in place
    ManifestTable.merge(raw2((2L, "b", "x", 20L), (1L, "a", "x", 2L))
      .transform(m2.project), 1L, m2, base, schema2, streamId = "S")
    assert(MaterializedView.refresh(spark, vd).isDefined)
    assert(asSet(MaterializedView.read(spark, vd)) == asSet(recompute()),
      "after composite-group moves")
    assert(!MaterializedView.read(spark, vd).collect().exists(r =>
      r.getString(0) == "a" && r.getString(1) == "y"),
      "vanished composite group must leave the view table")
    // groups sharing a component must stay distinct: delete all of
    // grp=b — BOTH (b,*) groups leave, (a,x) survives
    ManifestTable.delete(spark, base, schema2, "id", Seq(2L, 3L, 4L),
      token = 9L)
    assert(MaterializedView.refresh(spark, vd).isDefined)
    assert(asSet(MaterializedView.read(spark, vd)) == asSet(recompute()),
      "after erasing every group of one component value")
    assert(MaterializedView.read(spark, vd).count() == 1L)
    // replay safety unchanged under composite keys
    assert(MaterializedView.refresh(spark, vd).isEmpty)
  }

  test("composite-key encoding is injective where naive concat " +
      "collides") {
    // ("ab", "c") vs ("a", "bc") — same naive concat; the
    // escaped encoding must keep them distinct groups end-to-end.
    val schema2 = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("sub", StringType), StructField("v", LongType)))
    val rows = Seq(
      (1L, "ab", "c", 10L), (2L, "a", "bc", 5L),
      (3L, "a", "c", 3L))
    val base = fresh("mv_base_inj"); val view = fresh("mv_view_inj")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)): _*), schema2)
    val m2 = new Mapping()
    m2.auto("id"); m2.auto("grp"); m2.auto("sub"); m2.auto("v")
    m2.complete(schema2)
    ManifestTable.merge(df, 0L, m2, base, schema2, numBuckets = 2,
      streamId = "S")
    val vd = MaterializedView.View(
      baseRoot = base, baseSchema = schema2, baseKey = "id",
      viewRoot = view, groupCols = Seq("grp", "sub"),
      sumCols = Seq("v"), numBuckets = 2)
    MaterializedView.create(spark, vd)
    val got = MaterializedView.read(spark, vd).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Number](3).longValue)).toMap
    assert(got == rows.map(r => ((r._2, r._3), r._4)).toMap,
      s"control-character groups collided or corrupted: $got")
  }

  test("driver-cap fallback: a commit touching many more groups than " +
      "maxDriverKeys refreshes through the distributed path, chunked " +
      "deletes included, and lands on the full recompute") {
    val base = fresh("mv_base_cap"); val view = fresh("mv_view_cap")
    val m = mapping
    // 40 groups, 1 row each
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"g$i", (i * 10).toString)): _*)
        .transform(m.project),
      0L, m, base, schema, numBuckets = 4, streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    def recompute() = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, base, schema), Seq("grp"), Seq("v"),
      Seq("v"))
    // Bulk update: every group's only row shrinks — all 40 groups are
    // touched AND all 40 are min/max-suspect (each lost its attaining
    // row), so with maxDriverKeys = 5 the touched restriction, the
    // suspect recompute and the vanished diff all run distributed.
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"g$i", i.toString)): _*)
        .transform(m.project), 1L, m, base, schema, streamId = "S")
    assert(MaterializedView.refresh(spark, vd, maxDriverKeys = 5)
      .isDefined)
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()),
      "fallback refresh diverged from the recompute")
    // Bulk delete: 30 of 40 groups vanish — 6 delete chunks at cap 5.
    ManifestTable.delete(spark, base, schema, "id", (1L to 30L), token = 9L)
    val cur = ManifestTable.currentVersion(spark, base).get
    assert(MaterializedView.refresh(spark, vd, maxDriverKeys = 5)
      .contains(cur))
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()),
      "fallback refresh after bulk delete diverged")
    assert(MaterializedView.read(spark, vd).count() == 10L)
    // The FINAL delete chunk's token must be the base version itself,
    // so the completed refresh does not read as a crash in flight
    // (markerVersion's `token > marker` signature).
    assert(ManifestTable.currentManifest(spark, view).get.lastBatches
      .get(MaterializedView.DeleteStream).contains(cur),
      "multi-chunk delete must finish on the base-version token")
    // replay safety: already current, contents stable
    assert(MaterializedView.refresh(spark, vd, maxDriverKeys = 5).isEmpty)
    assert(vOf(MaterializedView.read(spark, vd)) == vOf(recompute()))
  }

  test("the view is a real manifest table: time travel shows the view " +
      "BEFORE a refresh") {
    val base = fresh("mv_base_tt"); val view = fresh("mv_view_tt")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "10")).transform(m.project),
      0L, m, base, schema, numBuckets = 2, streamId = "S")
    val vd = viewDef(base, view)
    MaterializedView.create(spark, vd)
    val vSchema = MaterializedView.read(spark, vd).schema
    val v1 = ManifestTable.currentVersion(spark, view).get
    ManifestTable.merge(raw((2L, "a", "5")).transform(m.project),
      1L, m, base, schema, streamId = "S")
    MaterializedView.refresh(spark, vd)
    // current view sees both rows; the pre-refresh snapshot still reads
    val now = ManifestTable.read(spark, view, vSchema)
      .filter($"grp" === "a").head
    assert(now.getLong(1) == 2L && now.getAs[Number](2).longValue == 15L)
    val then_ = ManifestTable.readAt(spark, view, vSchema, v1)
      .filter($"grp" === "a").head
    assert(then_.getLong(1) == 1L &&
      then_.getAs[Number](2).longValue == 10L)
  }
}
