package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{BloomSkip, ManifestTable, ZoneSkip}

/** [[ManifestTable.autoMaintain]] — declared sidecar maintenance on
  * the commit path: declare once, every data commit keeps the named
  * zone/bloom sidecars fresh, builds are incremental and best-effort
  * (a failing build never fails the published commit). */
class AutoMaintainSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("seg", StringType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def sideDirs(root: String, kind: String): Int =
    Option(new java.io.File(s"$root/$kind").list()).map(_.length)
      .getOrElse(0)

  test("declared sidecars build on declaration and refresh on every " +
      "commit; lookups prune without any explicit build call") {
    val root = freshRoot("amt_basic")
    ManifestTable.create(
      (1L to 2000L).map(i => (i, s"dom${i % 500}", i * 3))
        .toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("v"), blooms = Seq("seg"))
    // the declaring call itself covered the current state
    val zs0 = sideDirs(root, "zones")
    val bs0 = sideDirs(root, "blooms".replace("blooms", "bloom"))
    assert(zs0 > 0 && bs0 > 0, s"declaration must build ($zs0, $bs0)")
    // zone + bloom reads prune with NO explicit build anywhere
    val m = ManifestTable.currentManifest(spark, root).get
    assert(BloomSkip.prunedEntriesFor(spark, root, schema, m,
      "seg", Seq("dom7"))._1.size < m.entries.size)
    assert(ZoneSkip.lookupRange(spark, root, schema, "v", 30L, 60L)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      (10L to 20L).toSeq)
    // a later commit (targeted delete) refreshes coverage for its
    // rewritten files — the post-delete lookup stays exact
    ManifestTable.delete(spark, root, schema, "id", Seq(15L), token = 1L)
    assert(sideDirs(root, "zones") > zs0,
      "the commit must have refreshed the zone sidecar")
    assert(ZoneSkip.lookupRange(spark, root, schema, "v", 30L, 60L)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      ((10L to 20L).toSet - 15L).toSeq.sorted)
    assert(BloomSkip.lookupByColumn(spark, root, schema, "seg", "dom7")
      .count() == 4)
  }

  test("re-declaration replaces; empty declaration stops maintenance") {
    val root = freshRoot("amt_replace")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    ManifestTable.autoMaintain(spark, root, zones = Seq("v"))
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(zones = Seq("v"))))
    ManifestTable.autoMaintain(spark, root, blooms = Seq("seg"))
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(blooms = Seq("seg"))))
    ManifestTable.autoMaintain(spark, root)
    assert(ManifestTable.maintenanceOf(spark, root) == Some(ManifestTable.MaintainPolicy()))
    val zb = sideDirs(root, "zones")
    ManifestTable.delete(spark, root, schema, "id", Seq(7L), token = 1L)
    assert(sideDirs(root, "zones") == zb, "stopped maintenance is off")
  }

  test("a bad declaration never fails the commit (best-effort): " +
      "unknown columns are skipped, the data still lands") {
    val root = freshRoot("amt_bad")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"d$i", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("no_such_column"), blooms = Seq("also_missing"))
    ManifestTable.delete(spark, root, schema, "id", Seq(3L), token = 1L)
    assert(ManifestTable.read(spark, root, schema).count() == 49L)
    assert(sideDirs(root, "zones") == 0 && sideDirs(root, "bloom") == 0)
  }

  test("declared LAYOUT maintenance: a commit crossing the drift " +
      "threshold auto-reclusters (sorted again, zones fresh over the " +
      "new files); below-threshold commits leave the layout alone") {
    val root = freshRoot("amt_layout")
    ManifestTable.create(
      (1L to 2000L).map(i => (i, s"d${i % 10}", i * 3))
        .toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    ManifestTable.clusterBy(spark, root, schema, "id", "v",
      token = 1L, filesPerBucket = 4)
    // refuse a layout declaration on a table with no layout
    val bare = freshRoot("amt_layout_bare")
    ManifestTable.create(Seq((1L, "a", 1L)).toDF("id", "seg", "v"),
      "id", bare, numBuckets = 2)
    intercept[IllegalArgumentException] {
      ManifestTable.autoMaintain(spark, bare, reclusterDrift = 1)
    }
    ManifestTable.autoMaintain(spark, root, zones = Seq("v"),
      reclusterDrift = 2)
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(zones = Seq("v"), reclusterDrift = 2)))
    val vDecl = ManifestTable.currentVersion(spark, root).get
    // ONE drift file in the touched bucket (a delta tier ADDS a file,
    // keeping the clustered ones live): below the threshold of 2 —
    // the layout must NOT move
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    def raw(rows: (Long, String, String)*) = rows.zipWithIndex
      .map { case ((id, sg, vv), i) =>
        (Seq(id.toString, sg, vv), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw((10L, "dX", "30"))), 2L, m,
      root, schema, streamId = "S", delta = true)
    val vAfterDelta = ManifestTable.currentVersion(spark, root).get
    val mBelow = ManifestTable.currentManifest(spark, root).get
    assert(mBelow.entries.exists(!_.sorted), "fixture: drift exists")
    assert(vAfterDelta == vDecl + 1,
      "below-threshold maintenance must not commit anything")
    // a SECOND delta on the same key crosses the threshold: the
    // commit path itself re-clusters — no explicit recluster call
    ManifestTable.merge(m.project(raw((10L, "dY", "31"))), 3L, m,
      root, schema, streamId = "S", delta = true)
    val mAfter = ManifestTable.currentManifest(spark, root).get
    assert(mAfter.version == vAfterDelta + 2,
      s"delta + auto-recluster = two commits, got v${mAfter.version}")
    assert(mAfter.entries.forall(_.sorted),
      "the auto-reclustered table is fully layout-clean again")
    assert(mAfter.lastBatches.get("graft-maintain-recluster")
      .contains(vAfterDelta + 1), "the trigger rides its own ledger")
    // the folded delta override survives the re-layout
    assert(ManifestTable.read(spark, root, schema)
      .filter(col("id") === 10L).head.getString(1) == "dY")
    // zone sidecars were refreshed by the NESTED maintenance pass over
    // the re-clustered files: a narrow probe prunes and reads exactly
    // (id 10's v moved to 31, outside the probed range)
    val hit = ZoneSkip.lookupRange(spark, root, schema, "v", 300L, 600L)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq ==
      (100L to 200L).toSeq)
    assert(hit.inputFiles.length <
      ManifestTable.read(spark, root, schema).inputFiles.length / 2,
      "zones must stay file-granular after the auto refresh")
    // a quiet commit on the now-clean table: no recluster, no extra
    // version (the no-drift probe must not commit from the hook)
    ManifestTable.delete(spark, root, schema, "id", Seq(999999L),
      token = 4L) // miss-path: token-only commit
    assert(ManifestTable.currentVersion(spark, root).get ==
      mAfter.version + 1,
      "a no-drift maintained commit must stay ONE commit")
  }

  test("graft_maintenance: the observe half — declared policy plus " +
      "live drift accounting") {
    GraftExtensions.register(spark)
    val root = freshRoot("amt_observe")
    ManifestTable.create(
      (1L to 400L).map(i => (i, s"d${i % 10}", i * 3))
        .toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    // nothing declared: zero rows
    assert(spark.sql(s"SELECT * FROM graft_maintenance('$root')")
      .count() == 0L)
    ManifestTable.clusterBy(spark, root, schema, "id", "v",
      token = 1L, filesPerBucket = 2)
    ManifestTable.autoMaintain(spark, root, zones = Seq("v"),
      reclusterDrift = 2)
    val clean = spark.sql(s"SELECT * FROM graft_maintenance('$root')")
      .head
    assert(clean.getString(0) == "v" && clean.getInt(2) == 2 &&
      clean.getInt(3) == 0 && clean.getInt(4) == 0)
    // one delta file of drift: visible, below the threshold
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    ManifestTable.merge(
      Seq((Seq("10", "dX", "30"), 0L)).toDF("_raw", "_line")
        .transform(mp => m.project(mp)),
      2L, m, root, schema, streamId = "S", delta = true)
    val dirty = spark.sql(s"SELECT * FROM graft_maintenance('$root')")
      .head
    assert(dirty.getInt(3) == 1 && dirty.getInt(4) == 0,
      s"one pending drift file, none over threshold: $dirty")
  }

  test("SQL face: graft_auto_maintain declares and reports") {
    GraftExtensions.register(spark)
    val root = freshRoot("amt_sql")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    val r = spark.sql(
      s"SELECT * FROM graft_auto_maintain('$root', 'v', 'seg')").head
    assert(r.getString(0) == "v" && r.getString(1) == "seg")
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(zones = Seq("v"), blooms = Seq("seg"))))
    assert(sideDirs(root, "zones") > 0 && sideDirs(root, "bloom") > 0)
    // maintenance functions refuse inside views (no commits from a
    // SELECT-wrapped call)
    spark.sql(s"CREATE OR REPLACE TEMP VIEW amt_v AS " +
      s"SELECT * FROM graft_auto_maintain('$root', 'v', '')")
    val e = intercept[Exception](spark.sql("SELECT * FROM amt_v").head)
    assert(e.getMessage.contains("graft_auto_maintain"))
  }

  test("vacuum keeps committed declarations and GCs torn ones") {
    val root = freshRoot("amt_vacuum")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    ManifestTable.autoMaintain(spark, root, zones = Seq("v"))
    // a torn (no _SUCCESS, losing-attempt) maintain dir at a COMMITTED
    // version is garbage vacuum removes; dirs at versions above
    // current stay (they may belong to an in-flight commit)
    val torn = new java.io.File(s"$root/maintain/v0-deadbeef")
    torn.mkdirs()
    ManifestTable.delete(spark, root, schema, "id", Seq(7L), token = 1L)
    ManifestTable.vacuum(spark, root, keepLast = 1)
    assert(!torn.exists(), "torn maintain dir must be GC'd")
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(zones = Seq("v"))),
      "committed declaration survives vacuum")
    // and the policy still fires after vacuum
    val zb = sideDirs(root, "zones")
    ManifestTable.delete(spark, root, schema, "id", Seq(9L), token = 2L)
    assert(sideDirs(root, "zones") > zb)
  }

  test("declared DERIVED maintenance: registered index and view stay " +
      "fresh across commits with zero explicit refresh; the Auto " +
      "rewrite's freshness gate stays open") {
    val root = freshRoot("amt_derived")
    val ixRoot = freshRoot("amt_derived_idx")
    val vRoot = freshRoot("amt_derived_view")
    ManifestTable.create(
      (1L to 400L).map(i => (i, s"dom${i % 20}", i * 3))
        .toDF("id", "seg", "v"),
      "id", root, numBuckets = 4)
    val ix = graft.store.SecondaryIndex.Index(root, schema, "id",
      ixRoot, "seg", 4)
    graft.store.SecondaryIndex.create(spark, ix)
    val view = graft.store.MaterializedView.View(root, schema, "id",
      vRoot, Seq("seg"), Seq("v"))
    graft.store.MaterializedView.create(spark, view)
    ManifestTable.autoMaintain(spark, root, derived = true)
    // NO explicit refresh below this line.
    def mapping = {
      val m = new graft.mapping.Mapping()
      m.auto("id"); m.auto("seg"); m.auto("v")
      m.complete(schema)
      m
    }
    def raw(rows: (Long, String, Long)*) =
      rows.zipWithIndex.map { case ((id, g, v), i) =>
        (Seq(id.toString, g, v.toString), i.toLong) }
        .toDF("_raw", "_line")
    // commit 1: a merge moving ids 3, 401 into dom7
    ManifestTable.merge(mapping.project(
      raw((3L, "dom7", 999L), (401L, "dom7", 5L))),
      0L, mapping, root, schema, streamId = "t")
    val cur1 = ManifestTable.currentVersion(spark, root).get
    assert(graft.store.SecondaryIndex.appliedVersion(spark, ix) == cur1,
      "the commit hook must have advanced the index")
    assert(graft.store.MaterializedView.appliedVersion(spark, view)
      == cur1, "the commit hook must have advanced the view")
    // index serves the moved keys; view aggregates reflect the merge
    val keys = graft.store.SecondaryIndex
      .keysOf(spark, ix, Seq("dom7"), 1000).get.map(_.toString.toLong)
    assert(keys.toSet.contains(3L) && keys.toSet.contains(401L))
    val dom7 = graft.store.MaterializedView.read(spark, view)
      .filter(col("seg") === "dom7").head()
    val expect7 = (7L to 400L by 20L).map(_ * 3).sum + 999L + 5L
    assert(dom7.getAs[Long]("sum_v") == expect7,
      s"view must reflect the merge: $dom7 expected $expect7")
    // commit 2: a tombstone delete — still zero explicit refresh
    ManifestTable.delete(spark, root, schema, "id", Seq(3L),
      token = 9L, delta = true)
    val cur2 = ManifestTable.currentVersion(spark, root).get
    assert(graft.store.SecondaryIndex.appliedVersion(spark, ix) == cur2)
    assert(graft.store.MaterializedView.appliedVersion(spark, view)
      == cur2)
    assert(!graft.store.SecondaryIndex
      .keysOf(spark, ix, Seq("dom7"), 1000).get
      .map(_.toString.toLong).toSet.contains(3L),
      "hook refresh must apply the delete to the index")
    assert(graft.store.MaterializedView.read(spark, view)
      .filter(col("seg") === "dom7").head().getAs[Long]("sum_v") ==
      expect7 - 999L)
  }

  test("derived maintenance: a view with caller-supplied prep refuses " +
      "registration (it cannot ride a sidecar) and is never " +
      "hook-refreshed") {
    val root = freshRoot("amt_prep")
    val vRoot = freshRoot("amt_prep_view")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"d${i % 5}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    val prepped = graft.store.MaterializedView.View(root, schema, "id",
      vRoot, Seq("seg"), Seq("v"),
      prep = df => df.filter(col("v") > 10))
    graft.store.MaterializedView.create(spark, prepped)
    val e = intercept[IllegalArgumentException] {
      graft.store.MaterializedView.register(spark, prepped)
    }
    assert(e.getMessage.contains("prep"))
    // the create did NOT auto-register it: the root discovers no views
    assert(graft.store.MaterializedView
      .registeredViews(spark, root, schema).isEmpty)
  }

  test("declared SIZE maintenance: a commit pushing a leaf over " +
      "split_bytes auto-splits it from the hook; no operator call") {
    val root = freshRoot("amt_split")
    ManifestTable.create(
      (1L to 200L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    val sizes = ManifestTable.currentManifest(spark, root).get
      .entries.groupBy(_.bucket).view.mapValues(_.map(_.bytes).sum).toMap
    // threshold just above the current max: nothing splits at declare
    // time, the GROWTH commit below crosses it
    val threshold = sizes.values.max + 200
    ManifestTable.autoMaintain(spark, root, splitBytes = threshold)
    assert(ManifestTable.currentManifest(spark, root).get.splits.isEmpty,
      "declaring must not split under-threshold leaves")
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    def raw(rows: (Long, String, Long)*) =
      rows.zipWithIndex.map { case ((id, g, v), i) =>
        (Seq(id.toString, g, v.toString), i.toLong) }
        .toDF("_raw", "_line")
    // a merge tripling the table: some leaf must cross the threshold
    ManifestTable.merge(m.project(
      raw((201L to 600L).map(i => (i, s"x$i", i)): _*)),
      0L, m, root, schema, streamId = "g")
    val mAfter = ManifestTable.currentManifest(spark, root).get
    assert(mAfter.splits.nonEmpty,
      s"the hook must have split the oversized leaf: " +
        s"${mAfter.entries.groupBy(_.bucket).view
          .mapValues(_.map(_.bytes).sum).toMap} vs $threshold")
    // addressing stays exact with zero explicit calls anywhere
    assert(ManifestTable.read(spark, root, schema).count() == 600L)
    assert(ManifestTable.lookup(spark, root, schema, "id", Seq(3L, 550L))
      .collect().map(_.getLong(0)).toSet == Set(3L, 550L))
    // the observe face reports the declared threshold and no pending
    // oversize leaves after the hook ran
    GraftExtensions.register(spark)
    val obs = spark.sql(s"SELECT * FROM graft_maintenance('$root')").head
    assert(obs.getAs[Long]("split_bytes") == threshold)
    assert(obs.getAs[Int]("buckets_over_split") == 0,
      s"hook-split table must report no pending oversize: $obs")
  }

  test("declared COMPACTION: a commit leaving a bucket's chain at the " +
      "threshold folds it from the hook; below-threshold chains and " +
      "thin buckets are untouched; tombstones count and fold away") {
    val root = freshRoot("amt_compact")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    ManifestTable.autoMaintain(spark, root, compactFiles = 3)
    assert(ManifestTable.maintenanceOf(spark, root) ==
      Some(ManifestTable.MaintainPolicy(compactFiles = 3)))
    // 0 (off) and 1 (nothing to fold) are rejected at declaration
    intercept[IllegalArgumentException] {
      ManifestTable.autoMaintain(spark, root, compactFiles = 1)
    }
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    def raw(rows: (Long, String, String)*) = rows.zipWithIndex
      .map { case ((id, sg, vv), i) =>
        (Seq(id.toString, sg, vv), i.toLong) }
      .toDF("_raw", "_line")
    val vDecl = ManifestTable.currentVersion(spark, root).get
    // delta 1: key 10's bucket goes base+1 = 2 files — UNDER the
    // threshold, the hook must not commit anything
    ManifestTable.merge(m.project(raw((10L, "dA", "111"))), 1L, m,
      root, schema, streamId = "S", delta = true)
    assert(ManifestTable.currentVersion(spark, root).get == vDecl + 1,
      "below-threshold chain: one commit, no fold")
    // delta 2: the same bucket reaches 3 live files — the commit path
    // itself folds it (merge commit + compact commit)
    ManifestTable.merge(m.project(raw((10L, "dB", "222"))), 2L, m,
      root, schema, streamId = "S", delta = true)
    val preFold = ManifestTable.readManifest(spark, root, vDecl + 2)
    val folded = ManifestTable.currentManifest(spark, root).get
    assert(folded.version == vDecl + 3,
      s"delta + auto-compact = two commits, got v${folded.version}")
    assert(folded.entries.groupBy(_.bucket).values
      .forall(_.size == 1), "the tiered bucket folds to ONE file")
    assert(folded.lastBatches.get("graft-maintain-compact")
      .contains(vDecl + 2), "the fold rides its own ledger")
    assert(folded.lastCompact == preFold.lastCompact,
      "a hook fold must never burn the user compact-token slot")
    // thin buckets carried verbatim — same physical files
    val thinBefore = preFold.entries.groupBy(_.bucket)
      .filter(_._2.size < 3).values.flatten.map(_.relPath).toSet
    assert(thinBefore.subsetOf(folded.entries.map(_.relPath).toSet),
      "thin buckets must not rewrite")
    assert(ManifestTable.read(spark, root, schema)
      .filter(col("id") === 10L).head.getString(1) == "dB")
    assert(ManifestTable.read(spark, root, schema).count() == 100L)
    // tombstone deltas count toward the chain and fold away: at a
    // re-declared threshold of 2 EVERY tombstone commit folds its
    // bucket right back to one reconcile-free file (keys hash to
    // buckets, so a fixed pair of keys proves nothing about sharing
    // one — threshold 2 makes the leg bucket-assignment-proof)
    ManifestTable.autoMaintain(spark, root, compactFiles = 2)
    val k1 = 20L; val k2 = 22L
    ManifestTable.delete(spark, root, schema, "id", Seq(k1),
      token = 10L, delta = true)
    ManifestTable.delete(spark, root, schema, "id", Seq(k2),
      token = 11L, delta = true)
    val afterTomb = ManifestTable.currentManifest(spark, root).get
    assert(afterTomb.entries.forall(!_.tomb),
      "the fold must consume every tombstone in the folded bucket")
    assert(ManifestTable.read(spark, root, schema).count() == 98L)
    assert(ManifestTable.lookup(spark, root, schema, "id", Seq(k1, k2))
      .count() == 0L, "folded deletes stay deleted")
    // the observe face reports the declared threshold and a clean table
    GraftExtensions.register(spark)
    val obs = spark.sql(s"SELECT * FROM graft_maintenance('$root')").head
    assert(obs.getAs[Int]("compact_files") == 2)
    assert(obs.getAs[Int]("buckets_over_compact") == 0,
      s"hook-folded table must report no pending chains: $obs")
  }

  test("declared RETENTION: every commit vacuums at the declared " +
      "window; tagged snapshots and a lagging derived table's CDC " +
      "range both survive it") {
    val root = freshRoot("amt_vac")
    val ixRoot = freshRoot("amt_vac_idx")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"d${i % 10}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    def manifests: Set[Long] =
      Option(new java.io.File(s"$root/manifest").list()).toSeq.flatten
        .filter(n => n.startsWith("m") && n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toLong).toSet
    ManifestTable.autoMaintain(spark, root, vacuumKeep = 1)
    val v0 = ManifestTable.currentVersion(spark, root).get
    ManifestTable.tag(spark, root, "pin", v0)
    // two commits: each ends in a hook vacuum at keepLast=1 — only
    // the current version and the tagged v0 stay readable
    ManifestTable.delete(spark, root, schema, "id", Seq(1L), token = 1L)
    ManifestTable.delete(spark, root, schema, "id", Seq(2L), token = 2L)
    assert(manifests == Set(v0, v0 + 2),
      s"hook vacuum must keep current + tagged only: $manifests")
    assert(ManifestTable.readAt(spark, root, "pin").count() == 100L,
      "the tagged snapshot stays fully readable under auto-vacuum")
    // a REGISTERED derived table widens the effective window to its
    // CDC range: commits while it lags must not vacuum the manifests
    // its next refresh diffs (derived maintenance NOT declared — the
    // index refreshes explicitly, i.e. maximally lagging)
    val ix = graft.store.SecondaryIndex.Index(root, schema, "id",
      ixRoot, "seg", 2)
    graft.store.SecondaryIndex.create(spark, ix)
    val applied0 = graft.store.SecondaryIndex.appliedVersion(spark, ix)
    ManifestTable.delete(spark, root, schema, "id", Seq(3L), token = 3L)
    ManifestTable.delete(spark, root, schema, "id", Seq(4L), token = 4L)
    assert((applied0 to applied0 + 2).forall(manifests),
      s"the lagging index's diff window must survive: $manifests " +
        s"(applied $applied0)")
    // the refresh works off those manifests, then the next commit
    // shrinks the window back to keepLast + the tag
    graft.store.SecondaryIndex.refresh(spark, ix)
    ManifestTable.delete(spark, root, schema, "id", Seq(5L), token = 5L)
    val cur = ManifestTable.currentVersion(spark, root).get
    assert(!manifests.contains(applied0 + 1),
      "a caught-up index releases its window on the next commit")
    assert(manifests.contains(v0) && manifests.contains(cur))
    assert(ManifestTable.read(spark, root, schema).count() == 95L)
  }

  test("SQL faces carry the derived flag: declare via " +
      "graft_auto_maintain(..., 1) and observe via graft_maintenance") {
    val root = freshRoot("amt_sql_derived")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"d${i % 5}", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT * FROM graft_auto_maintain('$root', 'v', '', 0, 1)").head
    assert(r.getBoolean(3), s"declare face must echo derived: $r")
    val obs = spark.sql(s"SELECT * FROM graft_maintenance('$root')").head
    assert(obs.getAs[Boolean]("maintain_derived"),
      s"observe face must report derived: $obs")
  }
}
