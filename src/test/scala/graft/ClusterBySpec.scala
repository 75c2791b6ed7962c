package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{ManifestTable, ZoneSkip}

/** ManifestTable.clusterBy — the maintenance re-layout that makes zone
  * maps prune PRODUCTION (key-hash-bucketed) tables: same buckets, but
  * each bucket's rows split into files holding disjoint cluster-column
  * ranges, and single-seq buckets upgrade sidecar pruning to FILE
  * granularity. */
class ClusterBySpec extends SparkSpec {
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

  test("clusterBy preserves content exactly, splits buckets into " +
      "cluster-disjoint files, and replays as a token no-op") {
    val root = fresh("cluster_basic")
    // a MONOTONE score: on the hash layout it spreads over every
    // bucket — the exact shape zone maps could not prune before
    val df = (1L to 400L).map(i => (i, f"name$i%03d", i * 10L))
      .toDF("id", "name", "score")
    ManifestTable.create(df, "id", root, numBuckets = 8)
    val before = ManifestTable.read(spark, root, schema)
      .collect().map(_.mkString("|")).sorted.toSeq
    val v0 = ManifestTable.currentVersion(spark, root).get
    ManifestTable.clusterBy(spark, root, schema, "id", "score",
      token = 7L, filesPerBucket = 4)
    val m = ManifestTable.currentManifest(spark, root).get
    assert(m.clusterCol == "score", "manifest must record the clustering")
    assert(m.numBuckets == 8, "bucket layout unchanged")
    // content identical
    val after = ManifestTable.read(spark, root, schema)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(after == before, "clusterBy changed table content")
    // buckets actually split into several files, all bucket-stamped
    val perBucket = m.entries.groupBy(_.bucket)
    assert(m.entries.size > 8,
      s"expected multi-file buckets, got ${m.entries.size} entries")
    assert(m.entries.forall(_.named), "split files must be bucket-named")
    // within each bucket, the files' SCORE ranges are disjoint
    perBucket.foreach { case (b, es) =>
      val ranges = es.map { e =>
        val f = spark.read.schema(schema).parquet(s"$root/${e.relPath}")
          .agg(min("score"), max("score")).head
        (f.getLong(0), f.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) =>
          assert(hi1 < lo2, s"bucket $b files overlap in score: $ranges")
        case _ =>
      }
    }
    // key lookups still exact on the clustered layout
    assert(ManifestTable.lookup(spark, root, schema, "id", Seq(123L))
      .collect().map(_.getString(1)).toSeq == Seq("name123"))
    // token replay: no new version
    val v1 = ManifestTable.currentVersion(spark, root).get
    ManifestTable.clusterBy(spark, root, schema, "id", "score", token = 7L)
    assert(ManifestTable.currentVersion(spark, root).contains(v1),
      "replayed clusterBy must no-op")
    // time travel to the pre-cluster version still reads
    assert(ManifestTable.readAt(spark, root, schema, v0)
      .collect().map(_.mkString("|")).sorted.toSeq == before)
    // the key column refuses (the key layout already serves it)
    intercept[IllegalArgumentException] {
      ManifestTable.clusterBy(spark, root, schema, "id", "id", token = 8L)
    }
  }

  test("zone maps prune a clusterBy'd table file-granularly: the " +
      "monotone column that pruned NOTHING on the hash layout reads a " +
      "small fraction of files") {
    val root = fresh("cluster_zone")
    val df = (1L to 2000L).map(i => (i, s"n$i", i * 10L))
      .toDF("id", "name", "score")
    ManifestTable.create(df, "id", root, numBuckets = 8)
    // BEFORE clustering: zones exist but the hash layout spreads the
    // monotone score over every bucket — a range probe keeps all files
    ZoneSkip.buildZones(spark, root, schema, Seq("score"))
    val full = ManifestTable.read(spark, root, schema)
    val unpruned = ZoneSkip.lookupRange(spark, root, schema, "score",
      5000L, 5490L)
    assert(unpruned.inputFiles.length == full.inputFiles.length,
      "hash layout should not prune a monotone column (fixture check)")
    // cluster + re-zone (the new files are uncovered until built)
    // a narrow probe's floor is ~one file per bucket = 1/filesPerBucket
    // of the table; split deep enough that the fraction is visibly small
    ManifestTable.clusterBy(spark, root, schema, "id", "score",
      token = 7L, filesPerBucket = 8)
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) ==
      ManifestTable.currentManifest(spark, root).get.entries.size)
    val fullC = ManifestTable.read(spark, root, schema)
    val want = fullC.filter(col("score") >= 5000L && col("score") <= 5490L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(want.size == 50, s"fixture: ${want.size}")
    val hit = ZoneSkip.lookupRange(spark, root, schema, "score",
      5000L, 5490L)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq == want)
    val frac = hit.inputFiles.length.toDouble / fullC.inputFiles.length
    assert(frac <= 0.20,
      s"clustered zone read ${hit.inputFiles.length} of " +
        s"${fullC.inputFiles.length} files — expected a small fraction")
    // a disjoint range reads nothing
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
      1000000L, 2000000L).count() == 0L)
  }

  test("a delta merge onto a clustered table drops its buckets back to " +
      "bucket-granular pruning: no resurrection, exact reads") {
    val root = fresh("cluster_delta")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 200L).map(i => (i, s"n$i", (i * 10).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    ManifestTable.clusterBy(spark, root, schema, "id", "score",
      token = 7L, filesPerBucket = 4)
    ZoneSkip.buildZones(spark, root, schema, Seq("score"))
    // delta override: id 50's score moves 500 -> 999999
    ManifestTable.merge(raw((50L, "n50", "999999")).transform(m.project),
      1L, m, root, schema, streamId = "S", delta = true)
    // probing the OLD value's range: the clustered file's zone says
    // "maybe", but its bucket now carries a delta — the whole bucket
    // must read and reconcile, so the overridden row stays invisible
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 500L, 500L)
      .count() == 0L, "zone skipping resurrected an overridden row")
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
        999999L, 999999L).collect().map(_.getLong(0)).toSeq == Seq(50L))
    // untouched buckets still prune file-granularly
    val fullC = ManifestTable.read(spark, root, schema)
    val hit = ZoneSkip.lookupRange(spark, root, schema, "score",
      10L, 200L)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq ==
      fullC.filter(col("score").between(10L, 200L))
        .collect().map(_.getLong(0)).sorted.toSeq)
    assert(hit.inputFiles.length < fullC.inputFiles.length)
  }

  test("recluster rewrites ONLY drifted buckets (relPaths verbatim " +
      "elsewhere), restores file-granular zone pruning there, and " +
      "replays / no-drift calls are token no-ops") {
    val root = fresh("recluster_inc")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 2000L).map(i => (i, s"n$i", (i * 10).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 8, streamId = "S")
    ManifestTable.clusterBy(spark, root, schema, "id", "score",
      token = 7L, filesPerBucket = 4)
    assert(ManifestTable.currentManifest(spark, root).get
      .entries.forall(_.sorted),
      "cluster-written files must carry the format-12 sorted claim")
    // drift a SUBSET of buckets: one full-rewrite merge (2 keys) and
    // one delta tier (1 key) — both writers produce sorted=false files
    ManifestTable.merge(raw((101L, "u101", "1010"), (102L, "u102", "1020"))
      .transform(m.project), 1L, m, root, schema, streamId = "S")
    ManifestTable.merge(raw((103L, "u103", "999999"))
      .transform(m.project), 2L, m, root, schema, streamId = "S",
      delta = true)
    val mDrift = ManifestTable.currentManifest(spark, root).get
    val driftBuckets =
      mDrift.entries.filterNot(_.sorted).map(_.bucket).toSet
    assert(driftBuckets.nonEmpty && driftBuckets.size < 8,
      s"fixture: drift must be a proper bucket subset, got $driftBuckets")
    val before = ManifestTable.read(spark, root, schema)
      .collect().map(_.mkString("|")).sorted.toSeq
    val rewritten = ManifestTable.recluster(spark, root, schema,
      token = 8L, filesPerBucket = 4)
    assert(rewritten.toSet == driftBuckets,
      s"recluster must rewrite exactly the drifted buckets: " +
        s"$rewritten vs $driftBuckets")
    val mRe = ManifestTable.currentManifest(spark, root).get
    // undrifted buckets carry their files VERBATIM — the incremental
    // cost claim, file-level
    mDrift.entries.filterNot(e => driftBuckets(e.bucket)).foreach { e =>
      assert(mRe.entries.exists(x =>
        x.bucket == e.bucket && x.relPath == e.relPath),
        s"undrifted bucket ${e.bucket} lost ${e.relPath}")
    }
    assert(mRe.entries.forall(_.sorted), "the whole table is clustered " +
      "again after the refresh")
    assert(mRe.clusterCol == "score", "the layout definition persists")
    // content is exactly the pre-recluster state
    assert(ManifestTable.read(spark, root, schema)
      .collect().map(_.mkString("|")).sorted.toSeq == before)
    // zone pruning is file-granular on the REWRITTEN buckets again:
    // the delta override folded away, narrow probes prune
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) ==
      mRe.entries.size)
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
      999999L, 999999L).collect().map(_.getLong(0)).toSeq == Seq(103L))
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
      1030L, 1030L).count() == 0L,
      "zone skipping resurrected a delta-overridden row")
    val full = ManifestTable.read(spark, root, schema)
    val hit = ZoneSkip.lookupRange(spark, root, schema, "score",
      5000L, 5490L)
    assert(hit.inputFiles.length < full.inputFiles.length / 2)
    // token replay: no-op, version unchanged
    assert(ManifestTable.recluster(spark, root, schema, token = 8L)
      .isEmpty)
    assert(ManifestTable.currentVersion(spark, root).get == mRe.version)
    // no-drift call: commits the token ONLY — entries verbatim
    assert(ManifestTable.recluster(spark, root, schema, token = 9L)
      .isEmpty)
    val mNoop = ManifestTable.currentManifest(spark, root).get
    assert(mNoop.version == mRe.version + 1 &&
      mNoop.entries.map(_.relPath).sorted == mRe.entries.map(_.relPath).sorted)
    // threshold: a single drift file stays below minDriftFiles=2
    ManifestTable.merge(raw((104L, "u104", "1040"))
      .transform(m.project), 3L, m, root, schema, streamId = "S")
    assert(ManifestTable.recluster(spark, root, schema, token = 10L,
      minDriftFiles = 2).isEmpty, "below-threshold drift must not rewrite")
  }

  test("recluster refreshes a ZORDER layout from its recorded marker; " +
      "the SQL face reports (version, applied, buckets)") {
    GraftExtensions.register(spark)
    val root = fresh("recluster_z")
    val df = (1L to 1000L).map(i => (i, s"n${i % 50}", i * 10L))
      .toDF("id", "name", "score")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    ManifestTable.zOrderBy(spark, root, schema, "id",
      Seq("name", "score"), token = 1L, filesPerBucket = 4)
    assert(ManifestTable.currentManifest(spark, root).get
      .clusterCol == "zorder(name,score)")
    val m = mapping
    ManifestTable.merge(raw((7L, "drift", "70"))
      .transform(m.project), 10L, m, root, schema, streamId = "S")
    val ddl = "id BIGINT, name STRING, score BIGINT"
    val r = spark.sql("SELECT * FROM graft_recluster(" +
      s"'$root', '$ddl', 2)").head
    assert(r.getBoolean(1) && r.getInt(2) >= 1)
    val mRe = ManifestTable.currentManifest(spark, root).get
    assert(mRe.entries.forall(_.sorted))
    assert(mRe.clusterCol == "zorder(name,score)")
    // replayed token through the face: applied=false
    val r2 = spark.sql("SELECT * FROM graft_recluster(" +
      s"'$root', '$ddl', 2)").head
    assert(!r2.getBoolean(1))
    assert(ManifestTable.read(spark, root, schema)
      .filter(col("id") === 7L).head.getString(1) == "drift")
  }

  test("clusterBy keeps the zero-Exchange bucketed property but stops " +
      "claiming within-file key sort") {
    val root = fresh("cluster_spec")
    val df = (1L to 300L).map(i => (i, s"n$i", i * 3L))
      .toDF("id", "name", "score")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    ManifestTable.clusterBy(spark, root, schema, "id", "score",
      token = 7L, filesPerBucket = 3)
    val t = ManifestTable.read(spark, root, schema)
    val agg = t.groupBy("id").agg(sum("score"))
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy(key) must stay Exchange-free:\n$aggPlan")
    // the sort-merge self-join must SORT (files are cluster-sorted,
    // not key-sorted — a false sort claim would corrupt join results)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val a = ManifestTable.read(spark, root, schema).as("a")
      val b = ManifestTable.read(spark, root, schema).as("b")
      val j = a.join(b, $"a.id" === $"b.id").select($"a.id", $"b.score")
      assert(j.count() == 300)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"fixture wants SMJ:\n$plan")
      assert(plan.contains("Sort "),
        s"clustered files are not key-sorted; the SMJ must sort:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must stay Exchange-free:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
