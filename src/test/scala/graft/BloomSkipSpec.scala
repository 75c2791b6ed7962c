package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{BloomSkip, ManifestTable}

class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private def mapping = {
    val m = new Mapping()
    m.auto("id"); m.auto("name"); m.auto("score")
    m.complete(schema)
    m
  }

  private def raw(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, n, s), i) => (Seq(id.toString, n, s), i.toLong) }
      .toDF("_raw", "_line")

  private def fresh(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  test("bloom lookup equals the full-scan filter and reads fewer files") {
    val root = fresh("bloom_basic")
    val m = mapping
    // 200 near-unique names over 16 buckets
    ManifestTable.merge(
      raw((1L to 200L).map(i => (i, f"name$i%03d", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("name")) == 16)
    // repeated build: incremental no-op
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("name")) == 0)
    val hit = BloomSkip.lookupByColumn(spark, root, schema, "name",
      "name042")
    assert(hit.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((42L, "name042")))
    // pruning: the bloomed read touches fewer files than the full scan
    val full = ManifestTable.read(spark, root, schema)
    assert(hit.inputFiles.length < full.inputFiles.length,
      s"${hit.inputFiles.length} of ${full.inputFiles.length}")
    // absent value: empty, and (usually) zero files past the filters
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
      "nope").count() == 0L)
    // IN-list probe: one filter pass, one pruned read for the whole list
    val multi = BloomSkip.lookupByColumnIn(spark, root, schema, "name",
      Seq("name007", "name180", "nope"))
    assert(multi.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7L, 180L))
    assert(multi.inputFiles.length < full.inputFiles.length)
    // NULL probe is a usage error, not a silent empty
    intercept[IllegalArgumentException] {
      BloomSkip.lookupByColumn(spark, root, schema, "name", null)
    }
  }

  test("typed probes hash like the column: a BIGINT column probed with " +
      "an Int finds its rows") {
    val root = fresh("bloom_typed")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 50L).map(i => (i, s"n$i", (i * 7).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    BloomSkip.buildBlooms(spark, root, schema, Seq("score"))
    // score is LongType; probe with an Int — the cast discipline must
    // land on the same xxhash64 input as the build
    assert(BloomSkip.lookupByColumn(spark, root, schema, "score", 21)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("delta overrides stay invisible: bucket-granular skipping can " +
      "never resurrect an overridden row") {
    val root = fresh("bloom_delta")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"orig$i", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    // blooms cover the BASE files only
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("name")) == 4)
    // delta override: id 7's name changes orig7 -> changed7
    ManifestTable.merge(raw((7L, "changed7", "7")).transform(m.project),
      1L, m, root, schema, streamId = "S", delta = true)
    // probe the OLD value: the base file's bloom says "maybe" but the
    // bucket reconciles with its (un-bloomed) delta — the overridden
    // row must not come back
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "orig7")
      .count() == 0L, "bloom skipping resurrected an overridden row")
    // the NEW value lives in an uncovered delta file: conservative read
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
        "changed7").collect().map(_.getLong(0)).toSeq == Seq(7L))
    // incremental build covers exactly the delta file; both probes
    // still exact afterwards
    val built = BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    assert(built >= 1, s"expected the delta file covered, built $built")
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "orig7")
      .count() == 0L)
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
        "changed7").collect().map(_.getLong(0)).toSeq == Seq(7L))
    // ... and rows the override did NOT touch still read through the
    // same bucket
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "orig8")
      .collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  test("tombstone deletes stay visible under bloom skipping: a pruned " +
      "read can never resurrect a tombstoned row") {
    // The dangerous shape: blooms cover the base files AND the
    // key-only tombstone file (whose non-key columns are all NULL, so
    // every value probe says "absent" for it). Dropping the tombstone
    // while keeping the base file would resurrect the deleted row —
    // pruneAbsent's delta-aware bucket rule (all-or-nothing on
    // multi-seq buckets) is what prevents it; this pins that.
    val root = fresh("bloom_tomb")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"orig$i", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    ManifestTable.delete(spark, root, schema, "id", Seq(7L),
      token = 1L, delta = true)
    // cover EVERYTHING, tombstone file included
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("name")) >= 5)
    // probe the DELETED row's value: the base file's bloom says
    // "maybe", the tombstone's says "absent" — the bucket must still
    // reconcile with its tombstone and return nothing
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "orig7")
      .count() == 0L, "bloom skipping resurrected a tombstoned row")
    // untouched rows in the same bucket still read exactly
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "orig8")
      .collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  test("bloom revisions are additive: a second build over DIFFERENT " +
      "columns at the same version must not shadow the first, and " +
      "vacuum keeps every committed revision") {
    val root = fresh("bloom_revs")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 60L).map(i => (i, s"n$i", (i * 3).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("name")) == 4)
    // same version, different column → a REVISION sidecar
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("score")) == 4)
    def bothWork(): Unit = {
      assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "n9")
        .collect().map(_.getLong(0)).toSeq == Seq(9L),
        "name filters lost")
      assert(BloomSkip.lookupByColumn(spark, root, schema, "score", 27L)
        .collect().map(_.getLong(0)).toSeq == Seq(9L),
        "score filters lost")
      // both columns still PRUNE (filters resolvable, not just correct)
      val full = ManifestTable.read(spark, root, schema)
      assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
        "zzz-absent").inputFiles.length < full.inputFiles.length)
      assert(BloomSkip.lookupByColumn(spark, root, schema, "score",
        -1L).inputFiles.length < full.inputFiles.length)
    }
    bothWork()
    // a torn sidecar (no _SUCCESS) is invisible and vacuumed away;
    // committed revisions all survive
    val cur = ManifestTable.currentVersion(spark, root).get
    val torn = new java.io.File(s"$root/bloom/v$cur-torn123abc45")
    torn.mkdirs()
    ManifestTable.vacuum(spark, root, keepLast = 1)
    assert(!torn.exists(), "torn bloom dir must be vacuumed")
    assert(new java.io.File(s"$root/bloom").listFiles().length == 2,
      "both committed bloom revisions must survive vacuum")
    bothWork()
  }

  test("the build is distributed end-to-end: the sidecar write input " +
      "is the scan→bloom_agg→bloom_merge_agg pipeline, never " +
      "re-parallelized driver rows") {
    val root = fresh("bloom_distributed")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 200L).map(i => (i, f"name$i%03d", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    val (frame, _) = BloomSkip.planBuild(spark, root, schema,
      Seq("name", "score")).get
    val plan = frame.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_agg"),
      s"per-file aggregate missing from the build plan:\n$plan")
    assert(plan.contains("bloom_merge_agg"),
      s"per-entry OR-merge missing from the build plan:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      "the write input must be the distributed pipeline, not a " +
        s"driver-side collection re-parallelized:\n$plan")
    // the real build through the same plan: counts, incrementality and
    // lookups behave as before
    assert(BloomSkip.buildBlooms(spark, root, schema,
      Seq("name", "score")) == 32)
    assert(BloomSkip.buildBlooms(spark, root, schema,
      Seq("name", "score")) == 0)
    assert(BloomSkip.planBuild(spark, root, schema,
      Seq("name", "score")).isEmpty, "covered build must plan nothing")
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
        "name042").collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(BloomSkip.lookupByColumn(spark, root, schema, "score", 7L)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // partial coverage: a later build over one NEW column re-covers
    // every file for that column only (the anti-join path)
    assert(BloomSkip.buildBlooms(spark, root, schema, Seq("id")) == 16)
    assert(BloomSkip.lookupByColumn(spark, root, schema, "id", 9L)
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("bloom_merge_agg ORs serialized filters: a split entry keeps " +
      "both halves' values visible (no false negatives)") {
    import org.apache.spark.util.sketch.BloomFilter
    def ser(vs: Long*): Array[Byte] = {
      val f = BloomFilter.create(1024, 0.03)
      vs.foreach(f.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      f.writeTo(bos)
      bos.toByteArray
    }
    // two part files of one leaf-dir entry, disjoint value sets
    val rows = Seq(("e1", ser(1L, 2L)), ("e1", ser(3L, 4L)),
      ("e2", ser(9L)))
    val merged = BloomSkip.mergeForTest(
      rows.toDF("relPath", "bits"), 1024L, 0.03)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .toMap
    val e1 = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(merged("e1")))
    assert(Seq(1L, 2L, 3L, 4L).forall(e1.mightContainLong),
      "OR-merge lost a part file's values — a false negative at scale")
    val e2 = BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(merged("e2")))
    assert(e2.mightContainLong(9L) && !e2.mightContainLong(1L))
  }

  test("blooms survive unrelated merges and compaction rebuilds are " +
      "incremental") {
    val root = fresh("bloom_compact")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 60L).map(i => (i, s"v$i", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    // full (non-delta) merge rewrites some buckets: their new files are
    // uncovered until the next build, reads stay exact meanwhile
    ManifestTable.merge(raw((2L, "w2", "2")).transform(m.project),
      1L, m, root, schema, streamId = "S")
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "w2")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "v2")
      .count() == 0L)
    val built = BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    assert(built >= 1 && built <= 2,
      s"rebuild must cover only the rewritten bucket's file: $built")
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "v3")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("two-level probe: bucket summaries rule out most buckets before " +
      "any per-file filter row is read") {
    val root = fresh("bloom_twolevel")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 200L).map(i => (i, f"name$i%03d", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    // the summary sidecar exists: one row per (bucket, column)
    assert(BloomSkip.summariesOf(spark, root).count() == 16L)
    val (df, stats) = BloomSkip.lookupDiagnosed(spark, root, schema,
      "name", Seq("name042"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // at fpp 0.25 over 16 buckets, expect ~15 * 0.75 ≈ 11+ pruned by
    // the summary alone; the hard floor for the evidence is "most"
    assert(stats.summaryPruned.size >= 10,
      s"summary pruned only ${stats.summaryPruned.size} of 16 buckets")
    // the second level read filter rows ONLY for surviving buckets
    val total = ManifestTable.read(spark, root, schema).inputFiles.length
    assert(stats.fileFiltersRead <= total - stats.summaryPruned.size,
      s"read ${stats.fileFiltersRead} per-file filters with " +
        s"${stats.summaryPruned.size} buckets summary-pruned")
    // an absent probe: correctness unchanged
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name", "nope")
      .count() == 0L)
  }

  test("stale summaries are never trusted, and the rebuild covers " +
      "exactly the merge-touched buckets") {
    val root = fresh("bloom_sum_stale")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 200L).map(i => (i, f"name$i%03d", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    // rewrite one key's bucket: its summary no longer covers the live
    // file set
    ManifestTable.merge(raw((42L, "fresh42", "0")).transform(m.project),
      1L, m, root, schema, streamId = "S")
    // the NEW value must be found even though the stale summary has
    // never seen it — the summary is unusable for that bucket, so the
    // probe falls through to the per-file level (which is also
    // uncovered for the new file → the bucket reads); exactness holds
    val (hit, st1) = BloomSkip.lookupDiagnosed(spark, root, schema,
      "name", Seq("fresh42"))
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(42L))
    val staleBucket = ManifestTable.currentManifest(spark, root).get
      .entries.groupBy(_.bucket).collect {
        case (b, es) if es.exists(_.relPath.contains("v1-")) => b
      }.toSet
    assert(!st1.summaryPruned.exists(staleBucket),
      "a stale summary pruned its rewritten bucket")
    // incremental summary rebuild: only the stale (bucket, column)
    // pairs are in the plan
    val plan = BloomSkip.planSummaryBuild(spark, root, schema,
      Seq("name"), 0.25)
    assert(plan.isDefined)
    val rebuilt = plan.get._1.select("bucket").collect()
      .map(_.getInt(0)).toSet
    assert(rebuilt == staleBucket,
      s"expected stale buckets $staleBucket, plan rebuilds $rebuilt")
    BloomSkip.buildBlooms(spark, root, schema, Seq("name"))
    assert(BloomSkip.planSummaryBuild(spark, root, schema,
      Seq("name"), 0.25).isEmpty) // converged
    // post-rebuild: the bucket prunes again for absent values and the
    // new value still reads exactly
    val (hit2, st2) = BloomSkip.lookupDiagnosed(spark, root, schema,
      "name", Seq("fresh42"))
    assert(hit2.collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(BloomSkip.lookupByColumn(spark, root, schema, "name",
      "name042").count() == 0L) // overwritten value gone
    assert(st2.summaryPruned.size >= 10)
  }
}
