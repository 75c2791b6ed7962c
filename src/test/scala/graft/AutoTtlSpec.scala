package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** Declared ROW TTL ([[ManifestTable.autoMaintain]]'s
  * `ttlColumn`/`ttlMs`): rows older than the declared age expire from
  * the commit hook through the TOMBSTONE predicate delete — write cost
  * ∝ expired rows, the candidate probe is a zone-sidecar read, a
  * commit with nothing expirable commits NOTHING extra, expired
  * history stays time-travelable and CDC-visible, and compaction
  * reaches the sidecar-read-only steady state. Planted epochs are
  * far-past (2000) and far-future (2090), so the wall-clock cutoff
  * lands between them for any conceivable run. */
class AutoTtlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", LongType),
    StructField("v", LongType)))

  private val OldTs = 946684800000L // 2000-01-01 epoch millis
  private val FreshTs = 3786825600000L // 2090-01-01
  private val ThirtyDays = 30L * 24 * 3600 * 1000

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mkTable(root: String): Unit =
    ManifestTable.create(
      (1L to 300L).map(i =>
        (i, if (i % 3 == 0) OldTs else FreshTs, i * 7))
        .toDF("id", "ts", "v"),
      "id", root, numBuckets = 4)

  test("declaring TTL expires over-age rows immediately, as key " +
      "tombstones (carried data files stay byte-identical)") {
    val root = freshRoot("ttl_basic")
    mkTable(root)
    val before = ManifestTable.currentManifest(spark, root).get
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("ts"), ttlColumn = "ts", ttlMs = ThirtyDays)
    val after = ManifestTable.currentManifest(spark, root).get
    assert(after.version == before.version + 1,
      "the declaring pass expires in ONE commit")
    val got = ManifestTable.read(spark, root, schema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 300L).filter(_ % 3 != 0).toSet,
      "exactly the over-age rows expire")
    // tombstone cost class: every pre-existing data file carries
    // byte-identical; the expiry only ADDED slim tomb files
    val beforePaths = before.entries.map(_.relPath).toSet
    assert(before.entries.forall(e =>
      after.entries.exists(a => a.relPath == e.relPath && !a.tomb)))
    val added = after.entries.filterNot(e => beforePaths(e.relPath))
    assert(added.nonEmpty && added.forall(_.tomb),
      s"expiry must write only tombstones, got $added")
  }

  test("nothing expirable => no extra commit, ever (no version churn " +
      "on a quiet table); compaction reaches the zone-probe steady " +
      "state") {
    val root = freshRoot("ttl_quiet")
    mkTable(root)
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("ts"), compactFiles = 2,
      ttlColumn = "ts", ttlMs = ThirtyDays)
    // declaration pass: expiry commit + compaction fold commit
    val v0 = ManifestTable.currentVersion(spark, root).get
    val mp = {
      val m = new graft.mapping.Mapping()
      m.auto("id"); m.auto("ts"); m.auto("v"); m.complete(schema); m
    }
    def mergeOne(token: Long, id: Long): Unit =
      ManifestTable.merge(mp.project(
        Seq((Seq(id.toString, FreshTs.toString, "9"), 0L))
          .toDF("_raw", "_line")),
        token, mp, root, schema)
    mergeOne(10L, 5L)
    val v1 = ManifestTable.currentVersion(spark, root).get
    assert(v1 == v0 + 1,
      s"a fresh-rows commit must add exactly ONE version (the " +
        s"merge itself), got v$v0 -> v$v1")
    // post-compaction zone state: the probe proves no candidates, so
    // even the deleteWhere discovery never runs — behaviorally, more
    // quiet commits still advance one version each
    mergeOne(11L, 6L)
    assert(ManifestTable.currentVersion(spark, root).get == v1 + 1)
    // the second merge RE-INSERTED the expired key 6 with a fresh ts —
    // a re-added row lives again (TTL judges values, not key history)
    val got = ManifestTable.read(spark, root, schema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == ((1L to 300L).filter(_ % 3 != 0).toSet + 6L))
  }

  test("expired history stays time-travelable and the change feed " +
      "carries the deletes") {
    val root = freshRoot("ttl_history")
    mkTable(root)
    val vCreate = ManifestTable.currentVersion(spark, root).get
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("ts"), ttlColumn = "ts", ttlMs = ThirtyDays)
    val vExpire = ManifestTable.currentVersion(spark, root).get
    assert(ManifestTable.readAt(spark, root, schema, vCreate)
      .count() == 300L, "pre-expiry snapshot must still see all rows")
    val feed = ManifestTable.changes(spark, root, schema, "id",
      vCreate, vExpire)
      .select(col("id"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == (1L to 300L).filter(_ % 3 == 0)
      .map(i => (i, "delete")).toSet,
      "the TTL commit must feed exactly the expired keys as deletes")
  }

  test("declaration refusals: zone pairing, missing column, " +
      "unsupported type, inconsistent pair") {
    val root = freshRoot("ttl_refuse")
    ManifestTable.create(
      Seq((1L, "a", FreshTs)).toDF("id", "name", "ts"),
      "id", root, numBuckets = 2)
    def deny(body: => Unit, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    deny(ManifestTable.autoMaintain(spark, root,
      ttlColumn = "ts", ttlMs = ThirtyDays), "declare a zone")
    deny(ManifestTable.autoMaintain(spark, root, zones = Seq("nope"),
      ttlColumn = "nope", ttlMs = ThirtyDays), "not in the table schema")
    deny(ManifestTable.autoMaintain(spark, root, zones = Seq("name"),
      ttlColumn = "name", ttlMs = ThirtyDays), "must be timestamp")
    deny(ManifestTable.autoMaintain(spark, root,
      ttlColumn = "ts"), "together")
    deny(ManifestTable.autoMaintain(spark, root,
      ttlMs = ThirtyDays), "together")
  }

  test("timestamp-typed TTL column expires through the same path " +
      "(zone hint + predicate agree on the typed cutoff)") {
    val root = freshRoot("ttl_tstype")
    ManifestTable.create(
      (1L to 60L).map(i => (i,
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(
          if (i % 2 == 0) OldTs else FreshTs)), i))
        .toDF("id", "ts", "v"),
      "id", root, numBuckets = 2)
    val tschema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("v", LongType)))
    ManifestTable.autoMaintain(spark, root,
      zones = Seq("ts"), ttlColumn = "ts", ttlMs = ThirtyDays)
    val got = ManifestTable.read(spark, root, tschema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 60L).filter(_ % 2 != 0).toSet)
  }

  test("SQL face: graft_auto_maintain declares TTL (args 10/11), " +
      "graft_maintenance reports it, expiry runs immediately") {
    GraftExtensions.register(spark)
    val root = freshRoot("ttl_sql")
    mkTable(root)
    // ttlColumn without ttlMs refuses (the both-or-neither contract)
    val half = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_auto_maintain('$root', 'ts', '', 0, 0, " +
        s"0, 0, 0, '', 'ts')").head)
    assert(half.getMessage.contains("together"))
    val r = spark.sql(
      s"SELECT * FROM graft_auto_maintain('$root', 'ts', '', 0, 0, " +
        s"0, 0, 0, '', 'ts', $ThirtyDays)").head
    assert(r.getString(8) == "ts" && r.getLong(9) == ThirtyDays)
    // the declaration expired the planted over-age rows on the spot
    val got = ManifestTable.read(spark, root, schema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 300L).filterNot(_ % 3 == 0).toSet)
    // the observe half reports the declared TTL
    val obs = spark.sql(s"SELECT ttl_column, ttl_ms " +
      s"FROM graft_maintenance('$root')").head
    assert(obs.getString(0) == "ts" && obs.getLong(1) == ThirtyDays)
  }
}
