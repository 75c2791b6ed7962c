package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** [[ManifestTable.cloneAt]] — shallow clone: a new table whose v0
  * manifest references the source snapshot's files in place (zero data
  * copied), diverging copy-on-write; the default pin tags the source
  * version so its vacuum retains the shared bytes. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mapping = {
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    m
  }

  private def mergeRows(root: String, batch: Long,
      delta: Boolean, rows: (Long, Long)*): Unit = {
    val m = mapping
    val raw = rows.zipWithIndex
      .map { case ((id, v), i) => (Seq(id.toString, v.toString), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw), batch, m, root, schema,
      streamId = "clone-spec", delta = delta)
  }

  private def dataFiles(root: String): Set[String] = {
    val d = new java.io.File(s"$root/data")
    if (!d.exists()) Set.empty
    else org.apache.commons.io.FileUtils.listFiles(d, null, true)
      .toArray.map(_.toString).toSet
  }

  test("clone references source files in place: equal reads, zero " +
      "data copied, the pin tag lands on the source") {
    val src = freshRoot("clone_src")
    val dst = freshRoot("clone_dst")
    ManifestTable.create(
      (1L to 500L).map(i => (i, i * 2)).toDF("id", "v"),
      "id", src, numBuckets = 4)
    mergeRows(src, 1L, delta = true, (7L, 777L), (501L, 501L))
    val vSrc = ManifestTable.currentVersion(spark, src).get
    assert(ManifestTable.cloneAt(spark, src, dst) == vSrc)
    // equal reads, including the un-folded delta chain
    assert(ManifestTable.read(spark, dst, schema).collect().toSet ==
      ManifestTable.read(spark, src, schema).collect().toSet)
    assert(ManifestTable.read(spark, dst, schema)
      .filter(col("id") === 7L).head.getLong(1) == 777L)
    // zero data bytes under the clone; every entry is ext
    assert(dataFiles(dst).isEmpty, "a shallow clone copies no data")
    val mDst = ManifestTable.currentManifest(spark, dst).get
    assert(mDst.version == 0L)
    assert(mDst.entries.forall(_.relPath.startsWith("ext:")))
    assert(mDst.numBuckets == 4 && mDst.keyColumn == "id")
    // the pin: a clone-* tag on the SOURCE at the cloned version
    val pins = ManifestTable.tagsOf(spark, src)
    assert(pins.size == 1 && pins.head._1.startsWith("clone-") &&
      pins.head._2 == vSrc, s"pin tag must land on the source: $pins")
    // replay ledgers carry: the source's committed batch cannot
    // double-apply if a writer is redirected at the clone
    assert(mDst.lastBatches.get("clone-spec").contains(1L))
    // a second clone onto the same root refuses
    intercept[Exception] { ManifestTable.cloneAt(spark, src, dst) }
  }

  test("copy-on-write divergence: writes to the clone rewrite locally " +
      "and never touch source bytes; source writes stay invisible to " +
      "the clone") {
    val src = freshRoot("clone_cow_src")
    val dst = freshRoot("clone_cow_dst")
    ManifestTable.create(
      (1L to 200L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    val srcFiles = dataFiles(src)
    // mutate the clone: a keyed delete (bucket rewrite) + an upsert
    ManifestTable.delete(spark, dst, schema, "id", Seq(5L), token = 1L)
    mergeRows(dst, 2L, delta = false, (300L, 300L))
    assert(dataFiles(src) == srcFiles,
      "clone writes must not add/remove/modify source files")
    assert(ManifestTable.read(spark, src, schema).count() == 200L)
    assert(ManifestTable.read(spark, dst, schema).count() == 200L,
      "clone: 200 - 1 deleted + 1 inserted")
    assert(ManifestTable.lookup(spark, dst, schema, "id", Seq(5L))
      .count() == 0L)
    // source mutations after the clone are invisible to it
    ManifestTable.delete(spark, src, schema, "id", Seq(50L), token = 9L)
    assert(ManifestTable.lookup(spark, dst, schema, "id", Seq(50L))
      .count() == 1L, "the clone binds a snapshot, not the live table")
    // the clone's own vacuum GCs only clone-local superseded files
    // (fresh baseline: the source's own delete above added its files)
    val srcFiles2 = dataFiles(src)
    ManifestTable.vacuum(spark, dst, keepLast = 1)
    assert(dataFiles(src) == srcFiles2,
      "the clone's vacuum must never touch source bytes")
    assert(ManifestTable.read(spark, dst, schema).count() == 200L)
  }

  test("the pin protects shared bytes from the source's vacuum; " +
      "compaction folds ext chains into clone-local files") {
    val src = freshRoot("clone_pin_src")
    val dst = freshRoot("clone_pin_dst")
    ManifestTable.create(
      (1L to 300L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst) // pin = true
    // source moves on; its vacuum would retire the cloned snapshot's
    // files — the pin retains them
    ManifestTable.delete(spark, src, schema, "id", Seq(1L), token = 1L)
    ManifestTable.delete(spark, src, schema, "id", Seq(2L), token = 2L)
    ManifestTable.vacuum(spark, src, keepLast = 1)
    assert(ManifestTable.read(spark, dst, schema).count() == 300L,
      "the pinned snapshot's bytes must survive the source's vacuum")
    // compact on the clone (delta chain first): folded buckets become
    // clone-local; the fold breaks the byte-sharing for those buckets
    mergeRows(dst, 5L, delta = true, (3L, 999L))
    ManifestTable.compact(spark, dst, schema, "id", token = 77L,
      minFilesPerBucket = 2)
    val folded = ManifestTable.currentManifest(spark, dst).get
    val extLeft = folded.entries.filter(_.relPath.startsWith("ext:"))
    assert(extLeft.size < folded.entries.size,
      "the compacted bucket must hold clone-local files")
    assert(ManifestTable.read(spark, dst, schema)
      .filter(col("id") === 3L).head.getLong(1) == 999L)
    assert(ManifestTable.read(spark, dst, schema).count() == 300L)
  }

  test("clone at an older version, by tag, and clone-of-clone points " +
      "at the ORIGINAL bytes") {
    val src = freshRoot("clone_ver_src")
    ManifestTable.create(
      (1L to 100L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val v0 = ManifestTable.currentVersion(spark, src).get
    ManifestTable.tag(spark, src, "cut_v0", v0)
    ManifestTable.delete(spark, src, schema, "id", Seq(1L), token = 1L)
    // by explicit version
    val d1 = freshRoot("clone_ver_d1")
    ManifestTable.cloneAt(spark, src, d1, v0, pin = false)
    assert(ManifestTable.read(spark, d1, schema).count() == 100L)
    // by tag
    val d2 = freshRoot("clone_ver_d2")
    assert(ManifestTable.cloneAt(spark, src, d2, "cut_v0") == v0)
    assert(ManifestTable.read(spark, d2, schema).count() == 100L)
    // clone the clone: entries still point at the original root's
    // files (no daisy-chain through d2)
    val d3 = freshRoot("clone_ver_d3")
    ManifestTable.cloneAt(spark, d2, d3, pin = false)
    val qSrc = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(src)).toString
    assert(ManifestTable.currentManifest(spark, d3).get.entries
      .forall(_.relPath.startsWith(s"ext:$qSrc/")),
      "clone-of-clone must reference the ORIGINAL bytes")
    assert(ManifestTable.read(spark, d3, schema).count() == 100L)
  }

  test("per-file sidecars carry onto the clone under ext keys: zone " +
      "and bloom pruning and ANALYZE stats work from the first read; " +
      "derived registrations deliberately do not") {
    val src = freshRoot("clone_side_src")
    val dst = freshRoot("clone_side_dst")
    val schema3 = StructType(Seq(
      StructField("id", LongType),
      StructField("seg", StringType),
      StructField("v", LongType)))
    ManifestTable.create(
      (1L to 2000L).map(i => (i, s"dom${i % 100}", i * 3))
        .toDF("id", "seg", "v"),
      "id", src, numBuckets = 4)
    // cluster so the per-file v ranges are narrow — zones then prune
    // at FILE granularity, which is what must survive the clone
    ManifestTable.clusterBy(spark, src, schema3, "id", "v",
      token = 5L, filesPerBucket = 4)
    graft.store.ZoneSkip.buildZones(spark, src, schema3, Seq("v"))
    graft.store.BloomSkip.buildBlooms(spark, src, schema3, Seq("seg"))
    graft.store.ColStats.buildStats(spark, src, schema3, Seq("seg"))
    val ixRoot = freshRoot("clone_side_idx")
    graft.store.SecondaryIndex.create(spark,
      graft.store.SecondaryIndex.Index(src, schema3, "id", ixRoot,
        "seg", 2))
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    // zone pruning on the CLONE, fresh — exact values, fewer files
    val hit = graft.store.ZoneSkip.lookupRange(spark, dst, schema3,
      "v", 30L, 60L)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq ==
      (10L to 20L).toSeq)
    assert(hit.inputFiles.length <
      ManifestTable.read(spark, dst, schema3).inputFiles.length,
      "carried zones must prune the clone's ext files")
    // bloom pruning likewise
    val m = ManifestTable.currentManifest(spark, dst).get
    assert(graft.store.BloomSkip.prunedEntriesFor(spark, dst, schema3,
      m, "seg", Seq("dom7"))._1.size < m.entries.size,
      "carried blooms must prune the clone's ext files")
    // ANALYZE stats: full coverage on the fresh clone, zero builds
    val st = graft.store.ColStats.tableStats(spark, dst, Seq("seg"))
      .head
    assert(st.getLong(4) == st.getLong(5) && st.getLong(1) == 2000L,
      s"carried colstats must fully cover the clone: $st")
    // derived registrations must NOT carry: an inherited registration
    // would refresh clone commits into the SOURCE's index
    assert(graft.store.SecondaryIndex
      .registered(spark, dst, schema3).isEmpty,
      "index registrations must not follow the clone")
  }

  test("cross-feature: cloning a SPLIT, RENAMED, tombstone-carrying " +
      "source keeps every recorded layout fact working on the branch") {
    val src = freshRoot("clone_x_src")
    val dst = freshRoot("clone_x_dst")
    ManifestTable.create(
      (1L to 400L).map(i => (i, i * 2)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    // column mapping: rename v -> val2 (physical names stay on disk)
    ManifestTable.renameColumn(spark, src, "v", "val2")
    val renamed = StructType(Seq(
      StructField("id", LongType), StructField("val2", LongType)))
    // online split: over-median leaves fan out (manifest split tree)
    val m0 = ManifestTable.currentManifest(spark, src).get
    val bytes = m0.entries.groupBy(_.bucket).values
      .map(_.map(_.bytes).sum).toSeq.sorted
    ManifestTable.splitBuckets(spark, src, renamed, token = 50L,
      maxBytes = math.max(1L, bytes.min / 2))
    assert(ManifestTable.currentManifest(spark, src).get.splits.nonEmpty,
      "fixture: the source must actually be split")
    // a tombstone chain rides into the clone too
    ManifestTable.delete(spark, src, renamed, "id", Seq(10L),
      token = 51L, delta = true)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    val mDst = ManifestTable.currentManifest(spark, dst).get
    assert(mDst.splits == ManifestTable.currentManifest(spark, src)
      .get.splits, "the split tree carries")
    assert(mDst.colMap.nonEmpty, "the column mapping carries")
    // reads reconcile the tombstone under the renamed schema across
    // ext files
    assert(ManifestTable.read(spark, dst, renamed).count() == 399L)
    assert(ManifestTable.read(spark, dst, renamed)
      .filter(col("id") === 20L).head.getLong(1) == 40L)
    // keyed ops address the SPLIT leaves on the clone: a delete of a
    // key in a split leaf rewrites locally and stays exact
    ManifestTable.delete(spark, dst, renamed, "id", Seq(20L), token = 1L)
    assert(ManifestTable.lookup(spark, dst, renamed, "id",
      Seq(10L, 20L, 30L)).collect().map(_.getLong(0)).toSeq ==
      Seq(30L))
    assert(ManifestTable.read(spark, dst, renamed).count() == 398L)
    // and the source never moved
    assert(ManifestTable.read(spark, src, renamed).count() == 399L)
  }

  test("SQL face: graft_clone by tag with pin, observed via graft_tags") {
    val src = freshRoot("clone_sql_src")
    val dst = freshRoot("clone_sql_dst")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val v = ManifestTable.currentVersion(spark, src).get
    val r = spark.sql(
      s"SELECT * FROM graft_clone('$src', '$dst')").head
    assert(r.getLong(2) == v && r.getBoolean(3))
    assert(spark.sql(s"SELECT * FROM graft_table('$dst', " +
      s"'id BIGINT, v BIGINT')").count() == 50L)
    assert(spark.sql(s"SELECT * FROM graft_tags('$src')").count() == 1L)
    // pin=0 leaves the source untagged
    val dst2 = freshRoot("clone_sql_dst2")
    spark.sql(s"SELECT * FROM graft_clone('$src', '$dst2', $v, 0)")
      .collect()
    assert(spark.sql(s"SELECT * FROM graft_tags('$src')").count() == 1L)
  }

  test("a failed clone never strands its pin: losing the dst-create " +
      "race (or any commit failure) rolls the tag back — no orphan " +
      "retaining the source snapshot from vacuum forever") {
    val src = freshRoot("clone_unpin_src")
    val dst = freshRoot("clone_unpin_dst")
    ManifestTable.create(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    // occupy the destination: the clone must refuse...
    ManifestTable.create(Seq((1L, 1L)).toDF("id", "v"), "id", dst,
      numBuckets = 2)
    intercept[Exception] {
      ManifestTable.cloneAt(spark, src, dst)
    }
    // ...and leave ZERO tags behind on the source
    assert(ManifestTable.tagsOf(spark, src).isEmpty,
      s"failed clone stranded a pin: ${ManifestTable.tagsOf(spark, src)}")
    // a commit that THROWS after the pin landed (here: the destination
    // path is a plain file, so the manifest write cannot mkdir) also
    // rolls the tag back
    val dst3 = s"target/test-tmp/clone_unpin_dst3"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dst3))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dst3), "occupied")
    intercept[Exception] {
      ManifestTable.cloneAt(spark, src, dst3)
    }
    assert(ManifestTable.tagsOf(spark, src).isEmpty,
      "a throwing commit must unpin: " +
        ManifestTable.tagsOf(spark, src).toString)
    new java.io.File(dst3).delete()
    // a successful clone pins exactly its version, and remains pinned
    val dst2 = freshRoot("clone_unpin_dst2")
    val v = ManifestTable.cloneAt(spark, src, dst2)
    val tags = ManifestTable.tagsOf(spark, src)
    assert(tags.size == 1 && tags.values.head == v)
  }
}
