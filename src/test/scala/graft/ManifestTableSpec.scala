package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable

class ManifestTableSpec extends SparkSpec {
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

  private def bucketOf(id: Long, n: Int): Int =
    Seq(id).toDF("k").select(pmod(hash(col("k")), lit(n))).head.getInt(0)

  /** (relative path, size, md5) of every regular file under dir. */
  private def fileDigests(dir: String): Map[String, (Long, String)] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) Map.empty
    else {
      val s = Files.walk(base)
      try s.filter(Files.isRegularFile(_)).toArray.map { p0 =>
        val p = p0.asInstanceOf[java.nio.file.Path]
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
        (base.relativize(p).toString, (Files.size(p), md5))
      }.toMap
      finally s.close()
    }
  }

  test("MERGE rewrites only touched buckets; untouched files byte-identical") {
    val root = freshRoot("manifest_incremental")
    val m = mapping
    // v0: ids 1..8 spread over 4 buckets
    val ids = (1L to 8L)
    ManifestTable.merge(
      m.project(raw(ids.map(i => (i, s"n$i", i.toString)): _*)),
      0L, m, root, schema, numBuckets = 4)
    val m0 = ManifestTable.currentManifest(spark, root).get
    assert(m0.version == 0L && m0.numBuckets == 4)
    assert(m0.entries.map(_.rows).sum == 8)

    // v1 updates ONE key → exactly one touched bucket
    val hot = 3L
    val hotBucket = bucketOf(hot, 4)
    val untouchedDirs = m0.entries.filter(_.bucket != hotBucket)
    assert(untouchedDirs.nonEmpty, "need untouched buckets for the test")
    val before = untouchedDirs
      .map(e => e.relPath -> fileDigests(s"$root/${e.relPath}")).toMap

    ManifestTable.merge(m.project(raw((hot, "RENAMED", "99"))),
      1L, m, root, schema)
    val m1 = ManifestTable.currentManifest(spark, root).get
    assert(m1.version == 1L)

    // untouched buckets: same manifest entry (path + stats), same bytes
    untouchedDirs.foreach { e =>
      val e1 = m1.entries.find(_.bucket == e.bucket).get
      assert(e1 == e, s"untouched entry rewritten: $e -> $e1")
      assert(fileDigests(s"$root/${e.relPath}") == before(e.relPath),
        s"untouched data files changed on disk: ${e.relPath}")
    }
    // touched bucket: new entry under data/v1
    val hot1 = m1.entries.find(_.bucket == hotBucket).get
    assert(hot1.relPath.startsWith("data/v1/"),
      s"touched bucket not rewritten: $hot1")

    // table state is the correct merge
    val state = ManifestTable.read(spark, root, schema)
      .orderBy("id").collect().toSeq
    assert(state == ids.map(i =>
      if (i == hot) Row(i, "RENAMED", 99L)
      else Row(i, s"n$i", i)).toSeq)
  }

  test("key-range stats per bucket cover the bucket's keys") {
    val root = freshRoot("manifest_stats")
    val m = mapping
    ManifestTable.merge(
      m.project(raw((1L to 20L).map(i => (i, s"n$i", i.toString)): _*)),
      0L, m, root, schema, numBuckets = 4)
    val man = ManifestTable.currentManifest(spark, root).get
    man.entries.foreach { e =>
      val keys = spark.read.schema(schema).parquet(s"$root/${e.relPath}")
        .select(col("id").cast("string")).as[String].collect()
      assert(keys.length == e.rows)
      assert(keys.min == e.minKey && keys.max == e.maxKey,
        s"stats mismatch for bucket ${e.bucket}")
    }
  }

  test("replay of a committed version is a no-op") {
    val root = freshRoot("manifest_replay")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L, "a", "1"))), 0L, m, root, schema)
    ManifestTable.merge(m.project(raw((2L, "b", "2"))), 1L, m, root, schema)
    val before = ManifestTable.read(spark, root, schema)
      .orderBy("id").collect().toSeq
    val rewritten = ManifestTable.merge(
      m.project(raw((2L, "GARBAGE", "0"))), 1L, m, root, schema)
    assert(rewritten.isEmpty, "replay must not rewrite anything")
    assert(ManifestTable.read(spark, root, schema)
      .orderBy("id").collect().toSeq == before)
  }

  test("numBuckets is a table property; the parameter is ignored later") {
    val root = freshRoot("manifest_buckets")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L, "a", "1"))), 0L, m, root, schema,
      numBuckets = 4)
    ManifestTable.merge(m.project(raw((2L, "b", "2"))), 1L, m, root, schema,
      numBuckets = 99)
    assert(ManifestTable.currentManifest(spark, root).get.numBuckets == 4)
  }

  test("lookup prunes to the key's bucket files only") {
    val root = freshRoot("manifest_lookup")
    val m = mapping
    ManifestTable.merge(
      m.project(raw((1L to 32L).map(i => (i, s"n$i", i.toString)): _*)),
      0L, m, root, schema, numBuckets = 8)
    val man = ManifestTable.currentManifest(spark, root).get

    val got = ManifestTable.lookup(spark, root, schema, "id", Seq(7L, 19L))
      .orderBy("id").collect().toSeq
    assert(got == Seq(Row(7L, "n7", 7L), Row(19L, "n19", 19L)))

    // the scan must be backed ONLY by the buckets those keys hash to —
    // inputFiles names the exact parquet files behind the plan
    val wantedBuckets = Set(bucketOf(7L, 8), bucketOf(19L, 8))
    val files = ManifestTable.lookup(spark, root, schema, "id", Seq(7L, 19L))
      .inputFiles.toSeq
    assert(files.nonEmpty)
    val bucketsRead = files.flatMap(f =>
      "_bucket=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).toSet
    assert(bucketsRead.subsetOf(wantedBuckets),
      s"lookup read extra buckets: $bucketsRead vs $wantedBuckets " +
      s"(of ${man.entries.size} total)")
    assert(man.entries.size > wantedBuckets.size,
      "fixture too small to demonstrate pruning")

    // a key absent from the table returns empty without error
    assert(ManifestTable.lookup(spark, root, schema, "id", Seq(999L))
      .count() == 0)
  }

  test("targeted delete rewrites only the keys' buckets") {
    val root = freshRoot("manifest_delete")
    val m = mapping
    ManifestTable.merge(
      m.project(raw((1L to 16L).map(i => (i, s"n$i", i.toString)): _*)),
      0L, m, root, schema, numBuckets = 4)
    val m0 = ManifestTable.currentManifest(spark, root).get
    val victim = 5L
    val vb = bucketOf(victim, 4)
    ManifestTable.delete(spark, root, schema, "id", Seq(victim), 1L)
    val m1 = ManifestTable.currentManifest(spark, root).get
    assert(m1.version == 1L)
    // untouched buckets carry verbatim; victim's bucket rewritten
    m0.entries.filter(_.bucket != vb).foreach { e =>
      assert(m1.entries.find(_.bucket == e.bucket).contains(e))
    }
    assert(m1.entries.find(_.bucket == vb).get.relPath.startsWith("data/v1"))
    val ids = ManifestTable.read(spark, root, schema)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(victim) && ids.size == 15)
    // replayed delete is a no-op
    assert(ManifestTable.delete(
      spark, root, schema, "id", Seq(victim), 1L).isEmpty)
  }

  test("schema evolution: new nullable column reads old files as null") {
    val root = freshRoot("manifest_evolve")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L, "a", "1"))), 0L, m, root, schema)
    val wider = StructType(schema.fields :+
      StructField("extra", StringType))
    val widerMapping = {
      val mm = new Mapping()
      mm.auto("id"); mm.auto("name"); mm.auto("score"); mm.auto("extra")
      mm.complete(wider)
      mm
    }
    ManifestTable.merge(
      Seq((Seq("2", "b", "2", "x"), 0L)).toDF("_raw", "_line")
        .transform(widerMapping.project),
      1L, widerMapping, root, wider)
    val rows = ManifestTable.read(spark, root, wider)
      .orderBy("id").collect().toSeq
    assert(rows == Seq(
      Row(1L, "a", 1L, null), // old file: new column reads as null
      Row(2L, "b", 2L, "x")))
  }

  test("vacuum drops unreferenced data versions and old manifests") {
    val root = freshRoot("manifest_vacuum")
    val m = mapping
    ManifestTable.merge(
      m.project(raw((1L to 8L).map(i => (i, s"n$i", i.toString)): _*)),
      0L, m, root, schema, numBuckets = 2)
    // touch EVERY bucket so v0 becomes fully superseded
    ManifestTable.merge(
      m.project(raw((1L to 8L).map(i => (i, s"x$i", i.toString)): _*)),
      1L, m, root, schema)
    ManifestTable.vacuum(spark, root)
    assert(!new java.io.File(s"$root/data/v0").exists(),
      "fully superseded data version must be vacuumed")
    assert(!new java.io.File(s"$root/manifest/m0").exists())
    assert(ManifestTable.read(spark, root, schema).count() == 8)
  }
}
