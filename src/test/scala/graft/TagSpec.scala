package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** [[ManifestTable.tag]] — named snapshots: a tag pins a version under
  * a stable name, time travel resolves it (Scala, graft_table_at, SQL
  * `VERSION AS OF 'name'`), and vacuum retains the pinned snapshot —
  * manifest AND data — beyond keepLast until the tag is deleted. */
class TagSpec extends SparkSpec {
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

  private def bump(root: String, key: Long, token: Long): Unit =
    ManifestTable.delete(spark, root, schema, "id", Seq(key), token)

  test("tag pins a version; readAt(tag) equals readAt(version); " +
      "re-tagging moves the name; deleteTag removes it loudly") {
    val root = freshRoot("tag_basic")
    ManifestTable.create(
      (1L to 100L).map(i => (i, i * 3)).toDF("id", "v"),
      "id", root, numBuckets = 2)
    val v0 = ManifestTable.currentVersion(spark, root).get
    assert(ManifestTable.tag(spark, root, "corpus_v1") == v0)
    bump(root, 7L, 1L)
    val v1 = ManifestTable.currentVersion(spark, root).get
    assert(ManifestTable.tagsOf(spark, root) == Map("corpus_v1" -> v0))
    // the tag still reads the PRE-delete snapshot
    assert(ManifestTable.readAt(spark, root, "corpus_v1").count() == 100L)
    assert(ManifestTable.readAt(spark, root, "corpus_v1").collect()
      .toSet == ManifestTable.readAt(spark, root, v0).collect().toSet)
    // explicit-version tag + re-tag moves the name
    ManifestTable.tag(spark, root, "corpus_v1", v1)
    assert(ManifestTable.tagsOf(spark, root) == Map("corpus_v1" -> v1))
    assert(ManifestTable.readAt(spark, root, "corpus_v1").count() == 99L)
    // a second name coexists
    ManifestTable.tag(spark, root, "audit-2026.08", v0)
    assert(ManifestTable.tagsOf(spark, root).keySet ==
      Set("corpus_v1", "audit-2026.08"))
    ManifestTable.deleteTag(spark, root, "corpus_v1")
    assert(ManifestTable.tagsOf(spark, root).keySet ==
      Set("audit-2026.08"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.readAt(spark, root, "corpus_v1")
    }
    assert(e.getMessage.contains("corpus_v1") &&
      e.getMessage.contains("audit-2026.08"),
      s"unknown-tag error must list live tags: ${e.getMessage}")
    // deleteTag on an unknown name is a no-op, not an error
    ManifestTable.deleteTag(spark, root, "never_existed")
  }

  test("invalid names and unpinnable versions are refused") {
    val root = freshRoot("tag_refuse")
    ManifestTable.create(Seq((1L, 1L)).toDF("id", "v"),
      "id", root, numBuckets = 2)
    for (bad <- Seq("", "123", "a/b", "a b", "x" * 129))
      intercept[IllegalArgumentException] {
        ManifestTable.tag(spark, root, bad)
      }
    intercept[IllegalArgumentException] { // future version
      ManifestTable.tag(spark, root, "future",
        ManifestTable.currentVersion(spark, root).get + 5)
    }
  }

  test("vacuum retains tagged snapshots in full — manifest and data — " +
      "and retires them after deleteTag") {
    val root = freshRoot("tag_vacuum")
    ManifestTable.create(
      (1L to 200L).map(i => (i, i)).toDF("id", "v"),
      "id", root, numBuckets = 2)
    val v0 = ManifestTable.currentVersion(spark, root).get
    ManifestTable.tag(spark, root, "pinned", v0)
    bump(root, 5L, 1L)
    bump(root, 6L, 2L)
    ManifestTable.vacuum(spark, root, keepLast = 1)
    // v0 outlives the keepLast=1 window because the tag pins it; the
    // intermediate (untagged, unretained) version is gone
    assert(ManifestTable.readAt(spark, root, "pinned").count() == 200L,
      "the tagged snapshot must read in full after vacuum")
    intercept[IllegalArgumentException] {
      ManifestTable.readAt(spark, root, v0 + 1)
    }
    // delete the tag: the next vacuum retires the snapshot
    ManifestTable.deleteTag(spark, root, "pinned")
    ManifestTable.vacuum(spark, root, keepLast = 1)
    intercept[IllegalArgumentException] {
      ManifestTable.readAt(spark, root, v0)
    }
    // current state unharmed throughout
    assert(ManifestTable.read(spark, root, schema).count() == 198L)
  }

  test("TIMESTAMP AS OF resolves the newest version committed at or " +
      "before the instant; pre-table instants fail loudly") {
    val wh = freshRoot("tag_ts_wh")
    spark.conf.set("spark.sql.catalog.gts", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gts.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gts.db")
    spark.sql("""CREATE TABLE gts.db.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gts.db.t VALUES (1, 10)")
    val root = s"$wh/db/t"
    val v1 = ManifestTable.currentVersion(spark, root).get
    // pin the second commit's mtime STRICTLY after the first's (fs
    // mtime granularity can be a full second — no sleeps, set it)
    val m1 = new java.io.File(s"$root/manifest/m$v1")
    spark.sql("INSERT INTO gts.db.t VALUES (2, 20)")
    val m2 = new java.io.File(s"$root/manifest/m${v1 + 1}")
    m2.setLastModified(m1.lastModified() + 10000L)
    val midMillis = m1.lastModified() + 5000L
    assert(ManifestTable.versionAtTime(spark, root, midMillis) == v1)
    assert(spark.sql("SELECT * FROM gts.db.t TIMESTAMP AS OF " +
      s"timestamp_millis($midMillis)").count() == 1)
    assert(spark.sql("SELECT * FROM gts.db.t TIMESTAMP AS OF " +
      s"timestamp_millis(${m2.lastModified() + 1000L})").count() == 2)
    // an instant before the table existed fails loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gts.db.t TIMESTAMP AS OF " +
        "timestamp_millis(1000)").collect()
    }
    assert(e.getMessage.contains("oldest retained") ||
      Option(e.getCause).exists(_.getMessage.contains("oldest retained")),
      s"got: ${e.getMessage}")
  }

  test("commit times are MONOTONIC in version order: a later version " +
      "with a skewed-early mtime never resolves ahead of its elder, " +
      "and age retention never drops it while keeping the elder") {
    val root = freshRoot("tag_mono")
    ManifestTable.create(
      Seq((1L, 10L)).toDF("id", "v"), "id", root, numBuckets = 2)
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    ManifestTable.merge(m.project(
      Seq((Seq("2", "20"), 0L)).toDF("_raw", "_line")),
      1L, m, root, schema, streamId = "mono")
    // multi-writer clock skew: v1's file stamps EARLIER than v0's
    val f0 = new java.io.File(s"$root/manifest/m0")
    val f1 = new java.io.File(s"$root/manifest/m1")
    f0.setLastModified(1000000L)
    f1.setLastModified(500000L) // skewed 500 s early
    // raw mtimes would resolve t=700000 to v1 — a version "later" than
    // one not yet visible at t; the monotonic carry refuses instead
    val e = intercept[IllegalArgumentException] {
      ManifestTable.versionAtTime(spark, root, 700000L)
    }
    assert(e.getMessage.contains("oldest retained"), e.getMessage)
    // at v0's (carried) instant both are visible; version order wins
    assert(ManifestTable.versionAtTime(spark, root, 1000000L) == 1L)
    // retainMillis reads the same carried clock: a window covering the
    // elder covers the skewed-early junior too (raw mtimes would GC
    // m1's history while retaining m0's)
    val winMillis = System.currentTimeMillis() - 1000000L + 60000L
    ManifestTable.vacuum(spark, root, keepLast = 1,
      retainMillis = winMillis)
    assert(new java.io.File(s"$root/manifest/m0").exists() &&
      new java.io.File(s"$root/manifest/m1").exists(),
      "both versions sit inside the carried retention window")
    assert(ManifestTable.readAt(spark, root, 0L).count() == 1L)
  }

  test("age-based retention: retainMillis keeps every young version " +
      "whatever keepLast says — the reader-race guard") {
    val root = freshRoot("tag_retain")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", root, numBuckets = 2)
    val v0 = ManifestTable.currentVersion(spark, root).get
    bump(root, 1L, 1L)
    bump(root, 2L, 2L)
    // everything just committed is younger than an hour: a keepLast=1
    // vacuum retires NOTHING
    ManifestTable.vacuum(spark, root, keepLast = 1,
      retainMillis = 3600L * 1000)
    assert(ManifestTable.readAt(spark, root, v0).count() == 50L,
      "versions inside the retain window must survive keepLast")
    // without the window the same vacuum retires them
    ManifestTable.vacuum(spark, root, keepLast = 1)
    intercept[IllegalArgumentException] {
      ManifestTable.readAt(spark, root, v0)
    }
    // the auto-vacuum hook honors the session conf
    val root2 = freshRoot("tag_retain_auto")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", root2, numBuckets = 2)
    ManifestTable.autoMaintain(spark, root2, vacuumKeep = 1)
    spark.conf.set("spark.graft.vacuum.retainMs", (3600L * 1000).toString)
    try {
      val w0 = ManifestTable.currentVersion(spark, root2).get
      bump(root2, 1L, 1L)
      assert(ManifestTable.readAt(spark, root2, w0).count() == 50L,
        "the hook must honor spark.graft.vacuum.retainMs")
    } finally spark.conf.unset("spark.graft.vacuum.retainMs")
    bump(root2, 2L, 2L)
    intercept[IllegalArgumentException] {
      ManifestTable.readAt(spark, root2,
        ManifestTable.currentVersion(spark, root2).get - 2)
    }
  }

  test("SQL faces: graft_tag / graft_tags / graft_delete_tag, " +
      "graft_table_at by tag, and catalog VERSION AS OF 'tag'") {
    val wh = freshRoot("tag_sql_wh")
    spark.conf.set("spark.sql.catalog.gtag", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtag.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.db")
    spark.sql("""CREATE TABLE gtag.db.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gtag.db.t VALUES (1, 10), (2, 20), (3, 30)")
    val root = s"$wh/db/t"
    val vFull = ManifestTable.currentVersion(spark, root).get
    val tagged = spark.sql(s"SELECT * FROM graft_tag('$root', 'cut')")
      .head
    assert(tagged.getString(0) == "cut" && tagged.getLong(1) == vFull)
    spark.sql("DELETE FROM gtag.db.t WHERE id = 2")
    assert(spark.sql("SELECT * FROM gtag.db.t").count() == 2)
    // catalog time travel by tag name
    assert(spark.sql(
      "SELECT * FROM gtag.db.t VERSION AS OF 'cut'").count() == 3)
    // unknown tags fail with the live list, not a number-parse error
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM gtag.db.t VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("nope") && e.getMessage.contains("cut"))
    // catalog-free face: graft_table_at accepts the tag (and still the
    // numeric version, as a number or numeric string)
    assert(spark.sql(
      s"SELECT * FROM graft_table_at('$root', 'cut')").count() == 3)
    assert(spark.sql(
      s"SELECT * FROM graft_table_at('$root', $vFull)").count() == 3)
    assert(spark.sql(
      s"SELECT * FROM graft_table_at('$root', '$vFull')").count() == 3)
    // "what changed between corpus cuts": graft_changes by TAG names
    // equals the numeric diff between the pinned versions
    spark.sql(s"SELECT * FROM graft_tag('$root', 'cut2')").collect()
    val byTag = spark.sql(
      s"SELECT * FROM graft_changes('$root', 'cut', 'cut2')")
      .collect().map(_.toSeq.toList).sortBy(_.mkString("|")).toSeq
    val byVer = spark.sql(
      s"SELECT * FROM graft_changes('$root', $vFull, ${vFull + 1})")
      .collect().map(_.toSeq.toList).sortBy(_.mkString("|")).toSeq
    assert(byTag == byVer && byTag.nonEmpty,
      s"tag-addressed diff must equal the numeric diff: $byTag")
    // observe + delete faces
    assert(spark.sql(s"SELECT * FROM graft_tags('$root')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("cut", vFull), ("cut2", vFull + 1)))
    val del = spark.sql(
      s"SELECT * FROM graft_delete_tag('$root', 'cut')").head
    assert(del.getBoolean(2) && del.getLong(1) == vFull)
    assert(spark.sql(s"SELECT * FROM graft_tags('$root')").count() == 1,
      "cut2 remains after deleting cut")
  }
}
