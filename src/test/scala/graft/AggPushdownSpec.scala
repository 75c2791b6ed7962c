package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{ManifestTable, ZoneSkip}

/** Aggregate pushdown ([[graft.store.GraftAggScan]]): a SQL
  * `SELECT count(*) / min(c) / max(c)` over any graft face answers from
  * manifest + zone metadata — the plan carries the agg scan and reads
  * ZERO data files — while every shape the metadata cannot answer
  * exactly (filters, grouping, count(col), distinct, uncovered or
  * delta-carrying min/max) stays on the ordinary scan and stays exact. */
class AggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def face(root: String) =
    spark.read.format("graft").load(root)

  private def pushed(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("GraftAggScan")

  test("count(*) answers from metadata: pushed plan, zero files read, " +
      "exact on compacted and delta-carrying tables alike") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_basic")
    ManifestTable.create(
      (1L to 500L).map(i => (i, i)).toDF("id", "v"), "id", root,
      numBuckets = 8)
    val cnt = face(root).groupBy().count()
    assert(pushed(cnt), cnt.queryExecution.executedPlan.toString)
    assert(cnt.inputFiles.isEmpty)
    assert(cnt.head.getLong(0) == 500L)
    // delta tier: per-file counts overcount superseded keys; the scan
    // must reconcile, not sum blindly
    spark.createDataFrame(
        (480L to 520L).map(i => (i, i + 1000)).toDF("id", "v").rdd,
        schema)
      .write.format("graft").option("key", "id").option("delta", "true")
      .mode("append").save(root)
    val cnt2 = face(root).groupBy().count()
    assert(pushed(cnt2))
    assert(cnt2.head.getLong(0) == 520L)
    assert(face(root).count() == 520L) // Dataset.count goes the same way
  }

  test("time travel counts the travelled version") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_travel")
    ManifestTable.create(
      (1L to 100L).map(i => (i, i)).toDF("id", "v"), "id", root,
      numBuckets = 4)
    (101L to 150L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").option("key", "id")
      .mode("append").save(root)
    val v0 = spark.read.format("graft").option("versionAsOf", "0")
      .load(root).groupBy().count()
    assert(pushed(v0))
    assert(v0.head.getLong(0) == 100L)
    assert(face(root).count() == 150L)
  }

  test("shapes metadata cannot answer stay on the ordinary scan, exact") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_not")
    ManifestTable.create(
      (1L to 200L).map(i =>
        (i, if (i % 5 == 0) None else Some(i % 3))).toDF("id", "v"),
      "id", root, numBuckets = 4)
    val filtered = face(root).filter(col("v") === 1).groupBy().count()
    assert(!pushed(filtered), "a filtered count must not push")
    assert(filtered.head.getLong(0) ==
      (1L to 200L).count(i => i % 5 != 0 && i % 3 == 1))
    val grouped = face(root).groupBy("v").count()
    assert(!pushed(grouped))
    assert(grouped.count() == 4) // 0, 1, 2, null
    // count(col) must honor null semantics: 40 of 200 rows are null —
    // a blind metadata count(*) rewrite would answer 200
    val countCol = face(root).agg(count(col("v")))
    assert(countCol.head.getLong(0) == 160L)
    val distinct = face(root).agg(countDistinct(col("v")))
    assert(!pushed(distinct))
    assert(distinct.head.getLong(0) == 3L)
  }

  test("min/max answer from zone sidecars when exact, refuse otherwise") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_minmax")
    ManifestTable.create(
      (1L to 300L).map(i =>
        (i, if (i % 7 == 0) None else Some(i * 3))).toDF("id", "v"),
      "id", root, numBuckets = 4)
    // no zones yet: min/max must stay on the ordinary scan, exact
    val cold = face(root).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(!pushed(cold), "uncovered min/max must not push")
    assert(cold.head.toSeq == Seq(3L, 900L))
    // covered: pushed, zero files, same values; count rides along
    ZoneSkip.buildZones(spark, root, schema, Seq("v"))
    val hot = face(root)
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
    assert(pushed(hot), hot.queryExecution.executedPlan.toString)
    assert(hot.inputFiles.isEmpty)
    assert(hot.head.toSeq == Seq(300L, 3L, 900L))
    // a delta commit makes zones unable to answer exactly (a superseded
    // row may hold a phantom extremum): must fall back AND be exact —
    // the old max-holder (id=300, v=900) is overridden DOWNWARD
    spark.createDataFrame(
        Seq((300L, Some(5L))).toDF("id", "v").rdd, schema)
      .write.format("graft").option("key", "id").option("delta", "true")
      .mode("append").save(root)
    val afterDelta = face(root).agg(max(col("v")).as("mx"))
    assert(!pushed(afterDelta), "delta buckets must refuse min/max push")
    assert(afterDelta.head.getLong(0) == 897L)
  }

  test("min/max push for strings and doubles; all-null column is NULL") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_types")
    val s = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("void", LongType)))
    val rows = (1L to 100L).map(i =>
      (i, f"n$i%03d", i * 0.5, Option.empty[Long]))
    ManifestTable.create(rows.toDF("id", "name", "score", "void"),
      "id", root, numBuckets = 4)
    ZoneSkip.buildZones(spark, root, s, Seq("name", "score", "void"))
    val df = spark.read.format("graft").load(root)
      .agg(min(col("name")).as("a"), max(col("name")).as("b"),
        min(col("score")).as("c"), max(col("score")).as("d"),
        min(col("void")).as("e"))
    assert(pushed(df), df.queryExecution.executedPlan.toString)
    val r = df.head
    assert(r.getString(0) == "n001" && r.getString(1) == "n100")
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 50.0)
    assert(r.isNullAt(4), "min over an all-null column is NULL")
  }

  test("planning pins the snapshot: a commit landing between planning " +
      "and execution does not split one result row across versions") {
    GraftExtensions.register(spark)
    val root = freshRoot("aggpush_pin")
    ManifestTable.create(
      (1L to 200L).map(i => (i, i)).toDF("id", "v"), "id", root,
      numBuckets = 4)
    ZoneSkip.buildZones(spark, root, schema, Seq("v"))
    val df = face(root)
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
    // force planning (pushdown accepts, min/max answers freeze, the
    // scan pins the consulted manifest version) and HOLD that physical
    // plan — Dataset actions re-plan from the logical plan, which
    // re-pushes against the then-current manifest and is consistent by
    // construction; the hazard is a plan executed after a commit ...
    val planned = df.queryExecution.executedPlan
    assert(planned.toString.contains("GraftAggScan"), planned.toString)
    // ... and a commit lands before that execution
    (201L to 250L).map(i => (i, i)).toDF("id", "v")
      .write.format("graft").option("key", "id")
      .mode("append").save(root)
    val r = planned.executeCollect().head
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L,
      "count and max must both answer at the PLANNED version, got " +
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    // a fresh plan sees the new commit
    assert(face(root).count() == 250L)
  }

  test("the catalog face pushes too") {
    GraftExtensions.register(spark)
    // own catalog NAME (suites share the session in parallel; a shared
    // name re-pointed at another warehouse races the instance cache)
    spark.conf.set("spark.sql.catalog.graftagg", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftagg.warehouse",
      "target/test-tmp/aggpush_wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftagg.t")
    spark.sql("DROP TABLE IF EXISTS graftagg.t.counted")
    spark.sql("""CREATE TABLE graftagg.t.counted (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    (1L to 77L).map(i => (i, i)).toDF("id", "v")
      .createOrReplaceTempView("aggpush_src")
    spark.sql("INSERT INTO graftagg.t.counted SELECT * FROM aggpush_src")
    val df = spark.sql("SELECT count(*) AS n FROM graftagg.t.counted")
    assert(pushed(df), df.queryExecution.executedPlan.toString)
    assert(df.head.getLong(0) == 77L)
  }
}
