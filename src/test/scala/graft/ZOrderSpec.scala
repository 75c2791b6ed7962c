package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{ManifestTable, ZoneSkip}

/** [[ManifestTable.zOrderBy]] + [[ZoneSkip.lookupRanges]] — multi-column
  * clustering via Morton interleave. The driver gate (`manifest_zorder`)
  * pins the VALUES against DuckDB; these specs pin the layout claims:
  * content identity, BOTH dimensions pruning on a box probe (the thing
  * a single-column clusterBy cannot give), token replay, the recorded
  * `zorder(...)` claim following a column rename, and the refusal
  * surface. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("a", LongType),
    StructField("b", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  /** 4096 rows; a and b are independent uniforms on 0..63 — the 2-D
    * shape where one-column clustering leaves the other dimension
    * unprunable. */
  private def mkTable(root: String): DataFrame = {
    val df = (1L to 4096L)
      .map(i => (i, i % 64, (i / 64) % 64)).toDF("id", "a", "b")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    df
  }

  private def zorder(root: String, token: Long = 7L): Unit =
    ManifestTable.zOrderBy(spark, root, schema, "id", Seq("a", "b"),
      token = token, filesPerBucket = 16)

  test("zOrderBy keeps content identical and replays its token") {
    val root = freshRoot("zorder_content")
    val df = mkTable(root)
    zorder(root)
    val got = ManifestTable.read(spark, root, schema)
    assert(got.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    val v = ManifestTable.currentVersion(spark, root)
    zorder(root) // same token: no new commit
    assert(ManifestTable.currentVersion(spark, root) == v)
    assert(ManifestTable.currentManifest(spark, root).get.clusterCol ==
      "zorder(a,b)")
  }

  test("a box probe prunes files in BOTH dimensions; values exact") {
    val root = freshRoot("zorder_box")
    val df = mkTable(root)
    zorder(root)
    ZoneSkip.buildZones(spark, root, schema, Seq("a", "b"))
    val total = ManifestTable.read(spark, root, schema)
      .inputFiles.length
    assert(total >= 32, s"fixture too coarse: $total files")
    val box = ZoneSkip.lookupRanges(spark, root, schema,
      Seq(("a", 0L, 15L), ("b", 0L, 15L)))
    val expected = df.filter(col("a") <= 15 && col("b") <= 15)
      .orderBy("id").collect().toSeq
    assert(box.orderBy("id").collect().toSeq == expected)
    // 1/16 of the area: a z-layout must read a small fraction of files;
    // 50% is a loose bound that still rules out one-dimension-only
    // pruning of a 1/4-per-side probe
    val read = box.inputFiles.length
    assert(read * 2 < total, s"box probe read $read of $total files")
    // each SINGLE dimension also prunes on its own (the z property —
    // a plain clusterBy(a) layout gives nothing on b)
    val onlyB = ZoneSkip.lookupRanges(spark, root, schema,
      Seq(("b", 0L, 15L)))
    assert(onlyB.inputFiles.length < total,
      "z layout should prune on the second dimension alone")
    assert(onlyB.count() == df.filter(col("b") <= 15).count())
  }

  test("single-column clusterBy does NOT prune the other dimension — " +
      "the gap zOrderBy exists to close") {
    val root = freshRoot("zorder_vs_single")
    mkTable(root)
    ManifestTable.clusterBy(spark, root, schema, "id", "a",
      token = 3L, filesPerBucket = 16)
    ZoneSkip.buildZones(spark, root, schema, Seq("a", "b"))
    val total = ManifestTable.read(spark, root, schema)
      .inputFiles.length
    val onA = ZoneSkip.lookupRanges(spark, root, schema,
      Seq(("a", 0L, 15L))).inputFiles.length
    val onB = ZoneSkip.lookupRanges(spark, root, schema,
      Seq(("b", 0L, 15L))).inputFiles.length
    assert(onA * 2 < total, s"clustered column pruned $onA/$total")
    assert(onB == total,
      s"uniform b must not prune on an a-clustered layout ($onB/$total)")
  }

  test("lookupRanges is correct (unpruned) on a never-clustered table") {
    val root = freshRoot("zorder_unclustered")
    val df = mkTable(root)
    ZoneSkip.buildZones(spark, root, schema, Seq("a"))
    val got = ZoneSkip.lookupRanges(spark, root, schema,
      Seq(("a", 10L, 20L), ("b", null, 31L)))
    assert(got.orderBy("id").collect().toSeq ==
      df.filter(col("a").between(10, 20) && col("b") <= 31)
        .orderBy("id").collect().toSeq)
  }

  test("renameColumn rewrites the recorded zorder claim") {
    val root = freshRoot("zorder_rename")
    mkTable(root)
    zorder(root)
    ManifestTable.renameColumn(spark, root, "b", "bee")
    assert(ManifestTable.currentManifest(spark, root).get.clusterCol ==
      "zorder(a,bee)")
  }

  test("usage errors are loud") {
    val root = freshRoot("zorder_errors")
    mkTable(root)
    intercept[IllegalArgumentException] { // key is not clusterable
      ManifestTable.zOrderBy(spark, root, schema, "id",
        Seq("a", "id"), 1L)
    }
    intercept[IllegalArgumentException] { // one column -> clusterBy
      ManifestTable.zOrderBy(spark, root, schema, "id", Seq("a"), 1L)
    }
    intercept[IllegalArgumentException] { // duplicate columns
      ManifestTable.zOrderBy(spark, root, schema, "id",
        Seq("a", "a"), 1L)
    }
    intercept[IllegalArgumentException] { // 32 bits x 2 > 63
      ManifestTable.zOrderBy(spark, root, schema, "id",
        Seq("a", "b"), 1L, bits = 32)
    }
  }

  test("SQL face: graft_zorder_by re-lays out and replays") {
    GraftExtensions.register(spark)
    val root = freshRoot("zorder_sql")
    mkTable(root)
    val ddl = "id BIGINT, a BIGINT, b BIGINT"
    val r1 = spark.sql(
      s"SELECT * FROM graft_zorder_by('$root', '$ddl', 'id', 'a,b', 9)")
      .collect()
    assert(r1.head.getBoolean(1)) // applied
    val r2 = spark.sql(
      s"SELECT * FROM graft_zorder_by('$root', '$ddl', 'id', 'a,b', 9)")
      .collect()
    assert(!r2.head.getBoolean(1)) // replayed
    assert(ManifestTable.currentManifest(spark, root).get.clusterCol ==
      "zorder(a,b)")
  }
}
