package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{ManifestTable, ZoneSkip}

class ZoneSkipSpec extends SparkSpec {
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

  private def bucketOf(id: Long, n: Int): Int =
    Seq(id).toDF("k").select(pmod(hash(col("k")), lit(n))).head.getInt(0)

  test("range lookup equals the full-scan filter and reads fewer files") {
    val root = fresh("zone_basic")
    val m = mapping
    // Zone maps pay off when the column CLUSTERS with the layout (time
    // in an append-mostly table, ingest batch id, …): give each hash
    // bucket a disjoint score band — a plain `score = id` would spread
    // every band over every bucket and prune nothing, correctly.
    val score = (id: Long) => bucketOf(id, 16) * 1000L + id
    ManifestTable.merge(
      raw((1L to 200L).map(i =>
        (i, f"name$i%03d", score(i).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) == 16)
    // repeated build: incremental no-op
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) == 0)
    val full = ManifestTable.read(spark, root, schema)
    val want = full.filter(col("score") >= 3000L && col("score") <= 3999L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(want.nonEmpty)
    val hit = ZoneSkip.lookupRange(spark, root, schema, "score",
      3000L, 3999L)
    assert(hit.collect().map(_.getLong(0)).sorted.toSeq == want)
    assert(hit.inputFiles.length < full.inputFiles.length,
      s"${hit.inputFiles.length} of ${full.inputFiles.length}")
    // disjoint range: empty (the all-pruned path returns read().limit(0)
    // for schema fidelity, so file-count evidence lives on partial prunes)
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
      100000L, 200000L).count() == 0L)
    // half-open bounds match the full-scan filter
    def ids(df: DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(ZoneSkip.lookupRange(spark, root, schema, "score",
        15000L, null)) ==
      ids(full.filter(col("score") >= 15000L)))
    assert(ids(ZoneSkip.lookupRange(spark, root, schema, "score",
        null, 999L)) ==
      ids(full.filter(col("score") <= 999L)))
    // exclusive bounds, incl. their pruning (max exactly on the bound)
    val maxScore = full.agg(max("score")).head.getLong(0)
    assert(ids(ZoneSkip.lookupRange(spark, root, schema, "score",
        maxScore - 1L, null, loInclusive = false)) ==
      ids(full.filter(col("score") > maxScore - 1L)))
    assert(ZoneSkip.lookupRange(spark, root, schema, "score",
        maxScore, null, loInclusive = false).count() == 0L,
      "max==bound with an exclusive lo must prune the file")
    // unsupported column types refuse loudly
    intercept[IllegalArgumentException] {
      ZoneSkip.lookupRange(spark,
        root, StructType(Seq(StructField("b", BinaryType))), "b", 1, 2)
    }
  }

  test("delta overrides stay invisible: bucket-granular skipping can " +
      "never resurrect an overridden row") {
    val root = fresh("zone_delta")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"orig$i", i.toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) == 4)
    // delta override: id 7's score moves 7 -> 999
    ManifestTable.merge(raw((7L, "orig7", "999")).transform(m.project),
      1L, m, root, schema, streamId = "S", delta = true)
    // probing the OLD value: the base file's zone says "maybe" but the
    // bucket reconciles with its (un-zoned) delta — the overridden row
    // must not come back
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 7L, 7L)
      .count() == 0L, "zone skipping resurrected an overridden row")
    // the NEW value lives in an uncovered delta file: conservative read
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 999L, 999L)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    // incremental build covers exactly the delta file; still exact
    val built = ZoneSkip.buildZones(spark, root, schema, Seq("score"))
    assert(built >= 1, s"expected the delta file covered, built $built")
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 7L, 7L)
      .count() == 0L)
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 999L, 999L)
      .collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(ZoneSkip.lookupRange(spark, root, schema, "score", 8L, 8L)
      .collect().map(_.getLong(0)).toSeq == Seq(8L))
  }

  test("typed domains: doubles exactly, dates through ISO, strings in " +
      "code-point order (UTF-16 comparison would lose a row)") {
    val dSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DoubleType),
      StructField("day", DateType),
      StructField("tag", StringType)))
    val root = fresh("zone_typed")
    val emoji = new String(Character.toChars(0x1F600)) // above U+FFFF
    val df = Seq(
      (1L, 0.1, Date.valueOf("2020-01-05"), "alpha"),
      (2L, 0.25, Date.valueOf("2020-03-01"), "beta"),
      (3L, 1e-4, Date.valueOf("2019-12-31"), emoji),
      (4L, 7.5, Date.valueOf("2021-06-15"), "zeta"))
      .toDF("id", "price", "day", "tag")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    val nFiles = ManifestTable.currentManifest(spark, root).get.entries.size
    assert(ZoneSkip.buildZones(spark, root, dSchema,
      Seq("price", "day", "tag")) == 3 * nFiles)
    // doubles: exact boundaries
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "price", 1e-4, 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // dates probe with date or ISO-string bounds alike
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "day",
        Date.valueOf("2020-01-01"), "2020-12-31")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // the emoji row's file: max(tag) is the supplementary char. In
    // UTF-16 code-unit order emoji < "�" so a naive compare calls
    // the file definitely-below-lo and skips it; Spark's UTF-8/code-
    // point order says emoji > "�" — the row must come back.
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "tag",
        "�", null)
      .collect().map(_.getLong(0)).toSeq == Seq(3L),
      "code-point vs UTF-16 ordering divergence lost a row")
  }

  test("timestamps zone as exact epoch micros (sub-second bounds hold)") {
    val tSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType)))
    val root = fresh("zone_ts")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123456")),
      (2L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123457")),
      (3L, java.sql.Timestamp.valueOf("2021-07-15 12:00:00")))
      .toDF("id", "ts")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    assert(ZoneSkip.buildZones(spark, root, tSchema, Seq("ts")) ==
      ManifestTable.currentManifest(spark, root).get.entries.size)
    // a MICROsecond-tight range: a string rendering of the zone would
    // have truncated .123457 and over-pruned
    assert(ZoneSkip.lookupRange(spark, root, tSchema, "ts",
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123457"), null)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // string bounds parse through the column's type (session UTC)
    assert(ZoneSkip.lookupRange(spark, root, tSchema, "ts",
        "2020-06-01 00:00:00", "2022-01-01 00:00:00")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("negative zero: a file whose max renders as -0.0 still matches " +
      "an inclusive 0.0 bound (Spark orders -0.0 == 0.0)") {
    val zSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("price", DoubleType)))
    val root = fresh("zone_negzero")
    val df = Seq((1L, -0.0), (2L, -5.0), (3L, -3.25), (4L, -1.0))
      .toDF("id", "price")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    assert(ZoneSkip.buildZones(spark, root, zSchema, Seq("price")) ==
      ManifestTable.currentManifest(spark, root).get.entries.size)
    val full = ManifestTable.read(spark, root, zSchema)
    // Spark: -0.0 >= 0.0 is TRUE; Double.compare says -0.0 < 0.0 — an
    // un-normalized zone would mark id 1's file definitely-absent
    assert(full.filter(col("price") >= 0.0).collect()
      .map(_.getLong(0)).toSeq == Seq(1L), "fixture expectation")
    assert(ZoneSkip.lookupRange(spark, root, zSchema, "price", 0.0, null)
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "-0.0 max vs 0.0 inclusive bound dropped the row")
    // and the mirrored shape: probing [-0.0, ..] must not skip a
    // file whose max is +0.0
    assert(ZoneSkip.lookupRange(spark, root, zSchema, "price", -0.0, 0.0)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("extreme dates: years above 9999 order chronologically, not " +
      "lexically (epoch-day zones; '+10000-…' would sort below '9000-…')") {
    import java.time.LocalDate
    val dSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("day", DateType)))
    val root = fresh("zone_extreme_dates")
    val df = Seq(
      (1L, Date.valueOf(LocalDate.of(9999, 12, 31))),
      (2L, Date.valueOf(LocalDate.of(10000, 1, 5))),
      (3L, Date.valueOf(LocalDate.of(2020, 1, 1))))
      .toDF("id", "day")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    assert(ZoneSkip.buildZones(spark, root, dSchema, Seq("day")) ==
      ManifestTable.currentManifest(spark, root).get.entries.size)
    // lexically, Spark renders year 10000 as "+10000-01-05", which sorts
    // BELOW "9000-01-01" — a string-kind zone would skip id 2's file
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "day",
        Date.valueOf(LocalDate.of(9000, 1, 1)), null)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "far-future date row lost to lexical date ordering")
    // pruning still real across the epoch-day domain
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "day",
      Date.valueOf(LocalDate.of(10001, 1, 1)), null).count() == 0L)
    assert(ZoneSkip.lookupRange(spark, root, dSchema, "day",
        "2019-06-01", "2020-06-01")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("NULL discipline: ranges never match NULL rows, all-null covered " +
      "files count as definite misses") {
    val nSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", LongType)))
    val root = fresh("zone_nulls")
    val df = Seq[(Long, Option[Long])](
      (1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None))
      .toDF("id", "v")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    assert(ZoneSkip.buildZones(spark, root, nSchema, Seq("v")) ==
      ManifestTable.currentManifest(spark, root).get.entries.size)
    assert(ZoneSkip.lookupRange(spark, root, nSchema, "v", 0L, 100L)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // both bounds NULL → loud usage error, not a silent full scan
    intercept[IllegalArgumentException] {
      ZoneSkip.lookupRange(spark, root, nSchema, "v", null, null)
    }
  }

  test("bound rendering is driver-side: zero Spark jobs, exact domains") {
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(ZoneSkip.renderBound(spark,
          java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123456"),
          TimestampType)
        .contains("1577836800123456"), "timestamps render as epoch micros")
      assert(ZoneSkip.renderBound(spark, -0.0d, DoubleType)
        .contains("0.0"), "-0.0 normalizes to 0.0")
      assert(ZoneSkip.renderBound(spark,
          Date.valueOf("1970-01-11"), DateType)
        .contains("10"), "dates render as epoch days")
      assert(ZoneSkip.renderBound(spark, "42", LongType).contains("42"))
      assert(ZoneSkip.renderBound(spark, null, LongType).isEmpty)
      org.apache.spark.sql.graft.Bridge.waitListenerBus(spark)
      assert(jobs == 0, s"bound rendering launched $jobs Spark jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("zone revisions are additive; vacuum keeps every committed " +
      "revision and drops torn dirs") {
    val root = fresh("zone_revs")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 60L).map(i => (i, f"n$i%02d", (i * 3).toString)): _*)
        .transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("score")) == 4)
    // same version, different column → a REVISION sidecar
    assert(ZoneSkip.buildZones(spark, root, schema, Seq("name")) == 4)
    def bothWork(): Unit = {
      assert(ZoneSkip.lookupRange(spark, root, schema, "score", 27L, 27L)
        .collect().map(_.getLong(0)).toSeq == Seq(9L), "score zones lost")
      assert(ZoneSkip.lookupRange(spark, root, schema, "name", "n09", "n09")
        .collect().map(_.getLong(0)).toSeq == Seq(9L), "name zones lost")
      val full = ManifestTable.read(spark, root, schema)
      assert(ZoneSkip.lookupRange(spark, root, schema, "score",
        1000L, null).count() == 0L)
      assert(ZoneSkip.lookupRange(spark, root, schema, "name",
        "zzz", null).inputFiles.length < full.inputFiles.length)
    }
    bothWork()
    val cur = ManifestTable.currentVersion(spark, root).get
    val torn = new java.io.File(s"$root/zones/v$cur-torn123abc45")
    torn.mkdirs()
    ManifestTable.vacuum(spark, root, keepLast = 1)
    assert(!torn.exists(), "torn zone dir must be vacuumed")
    assert(new java.io.File(s"$root/zones").listFiles().length == 2,
      "both committed zone revisions must survive vacuum")
    bothWork()
  }
}
