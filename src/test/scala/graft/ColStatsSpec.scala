package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{ColStats, ManifestTable}

/** [[graft.store.ColStats]] — incremental ANALYZE: per-file row/null
  * counts + mergeable HLL distinct sketches in an additive sidecar;
  * covered files never rescan, the table fold is metadata-only. */
class ColStatsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("seg", StringType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def fixture(root: String): Unit =
    ManifestTable.create(
      (1L to 5000L).map(i => (i, s"dom${i % 500}", i))
        .toDF("id", "seg", "v")
        .withColumn("v", when(col("id") % 10 === 0,
          lit(null).cast(LongType)).otherwise(col("v"))),
      "id", root, numBuckets = 4)

  test("exact row/null counts and a tight NDV estimate from the " +
      "per-file fold; full coverage on a single-seq table") {
    val root = freshRoot("cs_basic")
    fixture(root)
    val stats = ColStats.analyze(spark, root, schema,
      Seq("seg", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val seg = stats("seg")
    assert(seg.getLong(1) == 5000L && seg.getLong(2) == 0L)
    val segNdv = seg.getLong(3)
    assert(math.abs(segNdv - 500L) <= 50L,
      s"seg NDV estimate must be within 10% of 500: $segNdv")
    val v = stats("v")
    assert(v.getLong(1) == 5000L)
    assert(v.getLong(2) == 500L, s"v nulls must be exact: ${v.getLong(2)}")
    val vNdv = v.getLong(3)
    assert(math.abs(vNdv - 4500L) <= 450L,
      s"v NDV estimate must be within 10% of 4500: $vNdv")
    // full coverage, exact fold
    assert(seg.getLong(4) == seg.getLong(5),
      "every live file covered after analyze")
    assert(seg.getBoolean(6), "a freshly created table is single-seq")
  }

  test("incremental: covered files never rescan; a commit's rewritten " +
      "bucket is the only new work; delta chains flip single_seq") {
    val root = freshRoot("cs_incr")
    fixture(root)
    val n1 = ColStats.buildStats(spark, root, schema, Seq("seg"))
    assert(n1 > 0)
    assert(ColStats.buildStats(spark, root, schema, Seq("seg")) == 0,
      "a covered table must build nothing")
    // a keyed delete rewrites ONE bucket: only its fresh files build
    ManifestTable.delete(spark, root, schema, "id", Seq(40L), token = 1L)
    val n2 = ColStats.buildStats(spark, root, schema, Seq("seg"))
    assert(n2 > 0 && n2 < n1,
      s"only the rewritten bucket's files rebuild: $n2 of $n1")
    val after = ColStats.tableStats(spark, root, Seq("seg")).head
    assert(after.getLong(1) == 4999L,
      "the fold over live files reflects the delete exactly")
    assert(after.getBoolean(6))
    // a delta tier: file-level sums now overcount the superseded row,
    // and the fold says so via single_seq = false
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    ManifestTable.merge(m.project(
      Seq((Seq("7", "domX", "7"), 0L)).toDF("_raw", "_line")),
      2L, m, root, schema, streamId = "S", delta = true)
    ColStats.buildStats(spark, root, schema, Seq("seg"))
    val delta = ColStats.tableStats(spark, root, Seq("seg")).head
    assert(!delta.getBoolean(6), "a delta chain is not single-seq")
    assert(delta.getLong(1) == 5000L,
      "file-level sums overcount the superseded row (4999 live + 1)")
  }

  test("shallow clones: ext files are skipped and visibly uncovered; " +
      "local rewrites become coverable") {
    val src = freshRoot("cs_clone_src")
    val dst = freshRoot("cs_clone_dst")
    fixture(src)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    assert(ColStats.buildStats(spark, dst, schema, Seq("seg")) == 0,
      "ext files never build")
    val st = ColStats.tableStats(spark, dst, Seq("seg")).collect()
    assert(st.isEmpty || st.head.getLong(4) == 0L,
      "coverage must be visibly zero on a fresh clone")
    // a local rewrite (keyed delete) produces coverable files
    ManifestTable.delete(spark, dst, schema, "id", Seq(40L), token = 1L)
    assert(ColStats.buildStats(spark, dst, schema, Seq("seg")) > 0)
    val st2 = ColStats.tableStats(spark, dst, Seq("seg")).head
    assert(st2.getLong(4) > 0L && st2.getLong(4) < st2.getLong(5),
      s"partial coverage reported honestly: $st2")
  }

  test("the DSv2 scan reports ANALYZE-fed column stats (NDV + null " +
      "count) to the optimizer; partial coverage and delta chains " +
      "withhold them") {
    val root = freshRoot("cs_scanstats")
    fixture(root)
    // reach the Scan through the public DSv2 plan (the scan class is
    // store-private; SupportsReportStatistics is the public face)
    def statsOf(r: String) = {
      val rel = spark.read.format("graft").load(r)
        .queryExecution.analyzed.collect {
          case s: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2Relation => s
        }.head
      rel.table.asInstanceOf[
          org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(new org.apache.spark.sql.util
          .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
        .build().asInstanceOf[
          org.apache.spark.sql.connector.read.SupportsReportStatistics]
        .estimateStatistics()
    }
    // no ANALYZE yet: column stats absent, size/rows still reported
    val before = statsOf(root)
    assert(before.columnStats().isEmpty)
    assert(before.numRows().getAsLong == 5000L)
    ColStats.buildStats(spark, root, schema, Seq("seg", "v"))
    val after = statsOf(root)
    val cs = after.columnStats()
    assert(cs.size == 2, s"both analyzed columns report: $cs")
    val byName = {
      val it = cs.entrySet().iterator()
      var m = Map.empty[String, org.apache.spark.sql.connector.read
        .colstats.ColumnStatistics]
      while (it.hasNext) { val e = it.next()
        m += (e.getKey.fieldNames()(0) -> e.getValue) }
      m
    }
    assert(byName("v").nullCount().getAsLong == 500L)
    val ndv = byName("seg").distinctCount().getAsLong
    assert(math.abs(ndv - 500L) <= 50L, s"seg NDV via the scan: $ndv")
    // a delta chain makes the fold an overcount: the scan must
    // WITHHOLD column stats rather than steer the optimizer wrong
    val m = {
      val mp = new graft.mapping.Mapping()
      mp.auto("id"); mp.auto("seg"); mp.auto("v"); mp.complete(schema)
      mp
    }
    ManifestTable.merge(m.project(
      Seq((Seq("7", "domX", "7"), 0L)).toDF("_raw", "_line")),
      2L, m, root, schema, streamId = "S", delta = true)
    ColStats.buildStats(spark, root, schema, Seq("seg", "v"))
    assert(statsOf(root).columnStats().isEmpty,
      "chain-overcounted stats must not reach the optimizer")
  }

  test("declared STATS maintenance: commits keep the per-file stats " +
      "and the scan's columnStats fresh with zero explicit builds") {
    val root = freshRoot("cs_declared")
    fixture(root)
    ManifestTable.autoMaintain(spark, root, statsCols = Seq("seg", "v"))
    // the declaring pass covered the current files; NO explicit
    // buildStats below this line
    assert(ColStats.buildStats(spark, root, schema, Seq("seg")) == 0,
      "declaration must have covered the bootstrap files")
    // a commit (keyed delete of a null-v row, id 40): the hook
    // refreshes the rewritten bucket's stats as part of committing
    ManifestTable.delete(spark, root, schema, "id", Seq(40L), token = 1L)
    val st = ColStats.tableStats(spark, root, Seq("v")).head
    assert(st.getLong(4) == st.getLong(5),
      "full coverage after the maintained commit, no explicit build")
    assert(st.getLong(1) == 4999L && st.getLong(2) == 499L,
      s"the fold reflects the delete exactly: $st")
    // the SQL declare face carries the stats columns
    GraftExtensions.register(spark)
    val obs = spark.sql(s"SELECT * FROM graft_maintenance('$root')").head
    assert(obs.getAs[String]("stats_cols") == "seg,v")
  }

  test("SQL faces: graft_analyze builds + folds; graft_col_stats " +
      "observes without building") {
    val root = freshRoot("cs_sql")
    fixture(root)
    val r = spark.sql(s"SELECT * FROM graft_analyze('$root', " +
      s"'id BIGINT, seg STRING, v BIGINT', 'seg')").head
    assert(r.getString(0) == "seg" && r.getLong(1) == 5000L)
    val o = spark.sql(s"SELECT * FROM graft_col_stats('$root', 'seg')")
      .head
    assert(o.getLong(1) == 5000L && o.getLong(4) == o.getLong(5))
    // the observe face never writes: no new sidecar revisions
    val dirs = Option(new java.io.File(s"$root/colstats").list())
      .map(_.length).getOrElse(0)
    spark.sql(s"SELECT * FROM graft_col_stats('$root', 'seg')").collect()
    assert(Option(new java.io.File(s"$root/colstats").list())
      .map(_.length).getOrElse(0) == dirs)
  }

  test("racing builders: duplicate (relPath, column) sidecar rows fold " +
      "ONCE — counts exact, covered_files never exceeds live_files, " +
      "liveStats matches") {
    val root = freshRoot("cs_race")
    fixture(root)
    ColStats.analyze(spark, root, schema, Seq("seg", "v"))
    // simulate the two-writer race: both maintain hooks saw the same
    // files uncovered and both appended — materialized here by cloning
    // the committed sidecar dir as a revision (the additive-dir naming
    // a real second writer would produce)
    val csDir = new java.io.File(s"$root/colstats")
    val committed = csDir.listFiles().filter(_.isDirectory).head
    org.apache.commons.io.FileUtils.copyDirectory(committed,
      new java.io.File(csDir, committed.getName + "-r1"))
    val stats = ColStats.tableStats(spark, root, Seq("seg", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val seg = stats("seg")
    assert(seg.getLong(1) == 5000L,
      s"duplicated sidecar rows must not double row_count: " +
        s"${seg.getLong(1)}")
    assert(stats("v").getLong(2) == 500L,
      s"null_count must stay exact: ${stats("v").getLong(2)}")
    assert(seg.getLong(4) <= seg.getLong(5),
      s"covered_files ${seg.getLong(4)} above live_files " +
        s"${seg.getLong(5)}")
    assert(seg.getLong(4) == seg.getLong(5) && seg.getBoolean(6))
    // the planner-facing driver fold applies the same keep-one rule
    val m = ManifestTable.currentManifest(spark, root).get
    val lv = ColStats.liveStats(spark, root, m)
    assert(lv("seg").rows == 5000L && lv("seg").full)
    assert(lv("v").nulls == 500L && lv("v").full)
  }
}
