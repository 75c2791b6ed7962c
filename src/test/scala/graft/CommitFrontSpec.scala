package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{CommitFront, ManifestTable}

/** The pluggable manifest publish: the OCC protocol must hold
  * unchanged through the conditional-put front (the S3 If-None-Match
  * shape), and the front itself must serve win/lose/torn-write
  * correctly. */
class CommitFrontSpec extends SparkSpec {
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

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def withConditionalPut[A](body: => A): A = {
    spark.conf.set("spark.graft.commitFront", "conditional-put")
    try body
    finally spark.conf.unset("spark.graft.commitFront")
  }

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("conditional-put publish: win, lose to an existing manifest, " +
      "torn write leaves nothing behind") {
    val dir = new Path(freshRoot("cfront_unit"))
    val f = fs(dir)
    f.mkdirs(dir)
    val dst = new Path(dir, "m0")
    val tmp = new Path(dir, ".tmp-m0")
    val front = CommitFront.ConditionalPut
    assert(front.publish(f, dst, tmp, "hello".getBytes, () => ()))
    assert(f.exists(dst))
    // second publish at the same version: lost race, dst untouched
    assert(!front.publish(f, dst, tmp, "usurper".getBytes, () => ()))
    val in = f.open(dst)
    val body = try new String(in.readAllBytes()) finally in.close()
    assert(body == "hello")
    // no temp files: conditional-put is a single-object write
    assert(f.listStatus(dir).map(_.getPath.getName).toSet == Set("m0"))
  }

  test("OCC through conditional-put: losing merge retries against the " +
      "winner, neither write lost, no temp manifests") {
    withConditionalPut {
      val root = freshRoot("cfront_occ")
      val m = mapping
      ManifestTable.merge(
        m.project(raw((1L to 8L).map(i => (i, s"n$i", i.toString)): _*)),
        0L, m, root, schema, numBuckets = 4, streamId = "A")
      var fired = false
      ManifestTable.testBeforeCommit = () => {
        if (!fired) {
          fired = true
          ManifestTable.merge(m.project(raw((7L, "FROM_B", "60"))),
            0L, m, root, schema, streamId = "B")
        }
      }
      try {
        val written = ManifestTable.merge(
          m.project(raw((3L, "FROM_A", "30"))),
          1L, m, root, schema, streamId = "A")
        assert(written.nonEmpty, "retried merge must still commit")
      } finally ManifestTable.testBeforeCommit = () => ()
      assert(ManifestTable.currentVersion(spark, root).contains(2L))
      val state = ManifestTable.read(spark, root, schema)
        .orderBy("id").collect().toSeq
      assert(state == (1L to 8L).map(i =>
        if (i == 3L) Row(i, "FROM_A", 30L)
        else if (i == 7L) Row(i, "FROM_B", 60L)
        else Row(i, s"n$i", i)).toSeq)
      // the front never writes temp manifests
      assert(!new java.io.File(s"$root/manifest").list()
        .exists(_.startsWith(".tmp")),
        "conditional-put must not leave temp manifest files")
    }
  }

  test("OCC through conditional-put: delete racing a merge — both " +
      "effects present in the final state") {
    withConditionalPut {
      val root = freshRoot("cfront_delete_race")
      val m = mapping
      ManifestTable.merge(
        m.project(raw((1L to 8L).map(i => (i, s"n$i", i.toString)): _*)),
        0L, m, root, schema, numBuckets = 4, streamId = "A")
      var fired = false
      ManifestTable.testBeforeCommit = () => {
        if (!fired) {
          fired = true
          ManifestTable.merge(m.project(raw((5L, "RACED", "50"))),
            0L, m, root, schema, streamId = "B")
        }
      }
      try ManifestTable.delete(spark, root, schema, "id", Seq(2L),
        token = 99L)
      finally ManifestTable.testBeforeCommit = () => ()
      val ids = ManifestTable.read(spark, root, schema)
        .select("id", "name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(!ids.contains(2L), "the delete must land")
      assert(ids(5L) == "RACED", "the racing merge must land")
    }
  }

  test("replay detection and time travel hold across fronts: commits " +
      "made under rename read back under conditional-put and vice versa") {
    val root = freshRoot("cfront_mixed")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L, "a", "1"))), 0L, m, root,
      schema, streamId = "S")
    withConditionalPut {
      // replay of batch 0 under the other front: still a no-op
      assert(ManifestTable.merge(m.project(raw((1L, "X", "9"))), 0L, m,
        root, schema, streamId = "S").isEmpty)
      ManifestTable.merge(m.project(raw((2L, "b", "2"))), 1L, m, root,
        schema, streamId = "S")
    }
    ManifestTable.merge(m.project(raw((3L, "c", "3"))), 2L, m, root,
      schema, streamId = "S")
    assert(ManifestTable.read(spark, root, schema).count() == 3L)
    assert(ManifestTable.readAt(spark, root, schema, 1L).count() == 2L)
  }

  test("a config typo refuses loudly instead of silently falling back " +
      "to rename") {
    spark.conf.set("spark.graft.commitFront", "conditonal-put") // sic
    try {
      val e = intercept[IllegalArgumentException] {
        val m = mapping
        ManifestTable.merge(m.project(raw((1L, "a", "1"))), 0L, m,
          freshRoot("cfront_typo"), schema, streamId = "S")
      }
      assert(e.getMessage.contains("commitFront"))
    } finally spark.conf.unset("spark.graft.commitFront")
  }
}
