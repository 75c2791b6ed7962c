package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable

/** The manifest table's native scan path (GraftFileIndex/GraftScan):
  * manifest-backed planning, key-predicate file pruning, and
  * BucketSpec-reported layouts (shuffle-free co-bucketed joins and
  * groupBy). Every pruning assertion pairs with a VALUE assertion
  * against an unpruned recompute — a pruning bug must show up as wrong
  * rows here, not just as a file count. */
class GraftFileIndexSpec extends SparkSpec {
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

  // ---------------------------------------------------- plan inspection

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case r: ReusedExchangeExec => scans(r.child)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
  }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
    case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
    case q: QueryStageExec => shuffles(q.plan)
    case s: ShuffleExchangeExec => s +: s.children.flatMap(shuffles)
    case other =>
      other.children.flatMap(shuffles) ++
        other.subqueries.flatMap(shuffles)
  }

  /** Files the executed scan actually selected (post-pruning). */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  // ------------------------------------------------------------- layout

  test("format-8 entries are file-granular with recorded bytes and names") {
    val root = freshRoot("gfi_format8")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 40L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, schema, numBuckets = 8)
    val mf = ManifestTable.currentManifest(spark, root).get
    assert(mf.format >= 8 && !mf.udfKey)
    assert(mf.entries.nonEmpty)
    mf.entries.foreach { e =>
      assert(e.relPath.endsWith(".parquet"), s"file-granular: ${e.relPath}")
      assert(e.named, s"bucket-id named: ${e.relPath}")
      val p = Paths.get(root, e.relPath)
      assert(Files.exists(p))
      assert(e.bytes == Files.size(p), "manifest-recorded size is exact")
    }
  }

  test("equality and IN pruning read only probe buckets, rows exact") {
    val root = freshRoot("gfi_eq")
    val m = mapping
    val rows = (1L to 200L).map(i => (i, s"n$i", (i * 3).toString))
    ManifestTable.merge(m.project(raw(rows: _*)), 0L, m, root, schema,
      numBuckets = 16)
    val nFiles = ManifestTable.currentManifest(spark, root).get.entries.size
    assert(nFiles == 16)
    val t = ManifestTable.read(spark, root, schema)

    val eq = t.filter(col("id") === 77L)
    assert(scannedFiles(eq) == 1, "one probe key = one bucket file")
    assert(sortedRows(eq) == Seq("77|n77|231"))

    val in = t.filter(col("id").isin(5L, 77L, 130L))
    assert(scannedFiles(in) <= 3)
    assert(sortedRows(in) ==
      Seq("130|n130|390", "5|n5|15", "77|n77|231").sorted)

    // conjunct with an unsupported shape still prunes via the key side
    val mixed = t.filter(col("id") === 77L && col("score") > 0L)
    assert(scannedFiles(mixed) == 1)
    assert(sortedRows(mixed) == Seq("77|n77|231"))

    // no key predicate: all files
    val full = t.filter(col("score") >= 0L)
    assert(scannedFiles(full) == nFiles)
    assert(full.count() == 200)
  }

  test("randomized probes never lose rows to pruning") {
    val root = freshRoot("gfi_random")
    val m = mapping
    val rows = (1L to 300L).map(i => (i, s"n$i", i.toString))
    ManifestTable.merge(m.project(raw(rows: _*)), 0L, m, root, schema,
      numBuckets = 16)
    val t = ManifestTable.read(spark, root, schema)
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val ks = Seq.fill(1 + rnd.nextInt(5))(1L + rnd.nextInt(400)) // some miss
      val pruned = sortedRows(t.filter(col("id").isin(ks.map(Long.box): _*)))
      val expect = rows.filter(r => ks.contains(r._1))
        .map(r => s"${r._1}|${r._2}|${r._3}").sorted
      assert(pruned == expect, s"keys $ks")
    }
  }

  test("comparator tables prune in normalized space") {
    val root = freshRoot("gfi_cmp")
    val sch = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val df = Seq(("  Alpha ", 1L), ("beta", 2L), ("GAMMA  ", 3L),
      ("delta", 4L), ("Eps", 5L)).toDF("k", "v")
    ManifestTable.create(df, "k", root, numBuckets = 8,
      keyComparator = c => lower(trim(c)))
    val mf = ManifestTable.currentManifest(spark, root).get
    assert(mf.keyExpr.nonEmpty && !mf.udfKey)
    val t = ManifestTable.read(spark, root, sch)
    // raw-key equality: the row's raw key normalizes like the literal,
    // so the probe lands in the right bucket
    val q = t.filter(col("k") === "  Alpha ")
    assert(scannedFiles(q) == 1)
    assert(sortedRows(q) == Seq("  Alpha |1"))
    // a literal that normalizes to a key with DIFFERENT raw text misses
    // (raw equality semantics) but must not error or over-read
    val miss = t.filter(col("k") === "alpha")
    assert(scannedFiles(miss) <= 1)
    assert(miss.count() == 0)
  }

  test("range-layout tables prune range predicates; hash layouts don't mis-prune") {
    val root = freshRoot("gfi_range")
    val sch = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val df = ('a' to 'z').map(c => (s"$c-key", c.toLong)).toDF("k", "v")
    ManifestTable.create(df, "k", root, numBuckets = 4,
      rangeBounds = Seq("g", "n", "t"))
    val t = ManifestTable.read(spark, root, sch)
    val hi = t.filter(col("k") >= "u")
    assert(scannedFiles(hi) == 1, "top range slice only")
    assert(hi.count() == ('u' to 'z').size)
    val mid = t.filter(col("k") >= "h" && col("k") < "n")
    assert(scannedFiles(mid) == 1)
    assert(mid.count() == ('h' to 'm').size)
    // equality on a range layout prunes through searchsorted
    val eq = t.filter(col("k") === "m-key")
    assert(scannedFiles(eq) == 1)
    assert(sortedRows(eq) == Seq(s"m-key|${'m'.toLong}"))

    // hash layout + LONG key: the format-9 writer records ORDER-TRUE
    // key zones (minZ/maxZ) per entry, so numeric ranges prune per
    // FILE — the lexical minKey/maxKey never could ("10" < "9")
    val root2 = freshRoot("gfi_range_hash")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 50L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root2, schema, numBuckets = 4)
    val t2 = ManifestTable.read(spark, root2, schema)
    val entries2 = ManifestTable.currentManifest(spark, root2).get.entries
    assert(entries2.forall(e => e.minZ.nonEmpty && e.maxZ.nonEmpty),
      "numeric identity keys must record zone stats")
    val r2 = t2.filter(col("id") >= 45L)
    assert(r2.count() == 6)
    val expect45 = entries2.count(_.maxZ.toLong >= 45L)
    assert(scannedFiles(r2) == expect45,
      s"id >= 45 must read exactly the ${expect45} zone-intersecting files")
    // beyond-domain probe: zero files (limit(0) short-circuit or empty
    // partition list — count is the evidence either way)
    val none = t2.filter(col("id") > 1000L)
    assert(none.count() == 0 && scannedFiles(none) == 0)
    // BETWEEN = And(>=, <=): both bounds prune, values exact
    // (scannedFiles must be the FIRST action on the frame — the
    // numFiles driver metric posts on the first materialization)
    val mid2 = t2.filter(col("id").between(10L, 12L))
    val expectMid = entries2.count(e =>
      e.maxZ.toLong >= 10L && e.minZ.toLong <= 12L)
    assert(scannedFiles(mid2) == expectMid)
    assert(mid2.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 11L, 12L))
    // the "10" < "9" trap directly: >= 9 keeps every file holding 9+
    assert(t2.filter(col("id") >= 9L).count() == 42)
  }

  test("legacy manifests without key zones read conservatively: numeric " +
      "ranges keep every file, rows exact") {
    val root = freshRoot("gfi_legacy_zones")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 40L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, schema, numBuckets = 4)
    // rewrite the committed manifest as a pre-zone FORMAT 8 one: strip
    // the clusterCol header token and each entry's minZ/maxZ fields —
    // exactly what a round-9 table on disk looks like
    val v = ManifestTable.currentVersion(spark, root).get
    val mf = new java.io.File(s"$root/manifest/m$v")
    val lines = org.apache.commons.io.FileUtils
      .readLines(mf, java.nio.charset.StandardCharsets.UTF_8)
    import scala.jdk.CollectionConverters._
    val rewritten = lines.asScala.toSeq.zipWithIndex.map {
      case (_, 0) => "graft-manifest 8"
      case (l, 1) => // header: format 8 carries 10 tokens (thru udfKey)
        l.split("\t", -1).take(10).mkString("\t")
      case (l, _) => // entries: format 8 carries 8 fields (thru named)
        l.split("\t", -1).take(8).mkString("\t")
    }
    org.apache.commons.io.FileUtils.writeLines(mf, "UTF-8",
      rewritten.asJava)
    // drop the local-FS checksum sidecar the out-of-band rewrite broke
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/manifest/.m$v.crc"))
    val mf2 = ManifestTable.currentManifest(spark, root).get
    assert(mf2.format == 8 &&
      mf2.entries.forall(e => e.minZ.isEmpty && e.maxZ.isEmpty),
      "fixture must read back as a zone-less format-8 manifest")
    val t = ManifestTable.read(spark, root, schema)
    val r = t.filter(col("id") >= 35L)
    assert(r.count() == 6, "legacy read must stay exact")
    assert(scannedFiles(r) == mf2.entries.size,
      "no zone stats -> conservative full keep")
  }

  test("delta buckets reconcile through the native scan, pruned") {
    val root = freshRoot("gfi_delta")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 60L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, schema, numBuckets = 4)
    ManifestTable.merge(m.project(raw((7L, "UPDATED", "700"))), 1L, m,
      root, schema, delta = true)
    val t = ManifestTable.read(spark, root, schema)
    assert(t.count() == 60)
    val q = t.filter(col("id") === 7L)
    assert(sortedRows(q) == Seq("7|UPDATED|700"))
    // bucket of key 7 carries base + delta: both files read, others not
    val totalFiles = ManifestTable.currentManifest(spark, root)
      .get.entries.size
    assert(totalFiles == 5)
    assert(scannedFiles(q) <= 2)
    // an update's OLD value is superseded even when its probe targets
    // the same bucket
    assert(t.filter(col("name") === "n7").count() == 0)
  }

  test("co-bucketed tables join and aggregate with zero shuffles") {
    val rootA = freshRoot("gfi_joinA")
    val rootB = freshRoot("gfi_joinB")
    val a = (1L to 500L).map(i => (i, s"left$i")).toDF("id", "la")
    val b = (251L to 750L).map(i => (i, i * 10)).toDF("id", "rb")
    ManifestTable.create(a, "id", rootA, numBuckets = 8)
    ManifestTable.create(b, "id", rootB, numBuckets = 8)
    val sa = StructType(Seq(StructField("id", LongType),
      StructField("la", StringType)))
    val sb = StructType(Seq(StructField("id", LongType),
      StructField("rb", LongType)))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = ManifestTable.read(spark, rootA, sa)
        .join(ManifestTable.read(spark, rootB, sb), "id")
      val got = sortedRows(j)
      assert(shuffles(j.queryExecution.executedPlan).isEmpty,
        "co-bucketed equi-join must not exchange")
      val expect = sortedRows(a.join(b, "id"))
      assert(got == expect)

      val g = ManifestTable.read(spark, rootA, sa)
        .groupBy(col("id")).agg(count(lit(1)).as("n"))
      assert(g.collect().length == 500)
      assert(shuffles(g.queryExecution.executedPlan).isEmpty,
        "groupBy(key) rides the reported bucketing")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts stay correct (Spark re-plans the join)") {
    val rootA = freshRoot("gfi_mismA")
    val rootB = freshRoot("gfi_mismB")
    val a = (1L to 100L).map(i => (i, s"x$i")).toDF("id", "la")
    val b = (1L to 100L).map(i => (i, i + 1000)).toDF("id", "rb")
    ManifestTable.create(a, "id", rootA, numBuckets = 8)
    ManifestTable.create(b, "id", rootB, numBuckets = 4)
    val sa = StructType(Seq(StructField("id", LongType),
      StructField("la", StringType)))
    val sb = StructType(Seq(StructField("id", LongType),
      StructField("rb", LongType)))
    val j = ManifestTable.read(spark, rootA, sa)
      .join(ManifestTable.read(spark, rootB, sb), "id")
    assert(sortedRows(j) == sortedRows(a.join(b, "id")))
  }

  test("null-keyed bootstrap rows survive pruned reads") {
    val root = freshRoot("gfi_null")
    val sch = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val df = Seq(("a", 1L), (null, 2L), ("c", 3L)).toDF("k", "v")
    ManifestTable.create(df, "k", root, numBuckets = 4)
    val t = ManifestTable.read(spark, root, sch)
    assert(t.count() == 3)
    assert(sortedRows(t.filter(col("k") === "a")) == Seq("a|1"))
    assert(t.filter(col("k").isNull).count() == 1)
    assert(t.filter(col("k") === "zzz").count() == 0)
  }

  test("legacy (format-7) manifests read unpruned and unbucketed") {
    val root = freshRoot("gfi_legacy")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 30L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, schema, numBuckets = 4)
    // Downgrade the committed manifest to what a format-7 writer left:
    // header 7, no udfKey field, directory-granular entries without
    // bytes/named.
    val mPath = Paths.get(root, "manifest", "m0")
    val lines = new String(Files.readAllBytes(mPath),
      StandardCharsets.UTF_8).split("\n")
    val hdr = lines(1).split("\t", -1).dropRight(1).mkString("\t")
    val entries = lines.drop(2).map { l =>
      val f = l.split("\t", -1)
      val dir = f(4).substring(0, f(4).lastIndexOf('/'))
      (f.take(4) :+ dir :+ f(5)).mkString("\t")
    }
    Files.write(mPath,
      (Seq("graft-manifest 7", hdr) ++ entries).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    // the local FS is checksummed; the NIO rewrite staled the sidecar
    Files.deleteIfExists(mPath.getParent.resolve(".m0.crc"))
    val mf = ManifestTable.currentManifest(spark, root).get
    assert(mf.format == 7 && mf.entries.forall(e => !e.named && e.bytes == 0))
    val t = ManifestTable.read(spark, root, schema)
    assert(t.count() == 30)
    val q = t.filter(col("id") === 7L)
    assert(sortedRows(q) == Seq("7|n7|7"))
    // identity cannot be proven by a pre-8 manifest: no pruning claimed
    assert(scannedFiles(t.filter(col("id") === 7L)) == 4)
  }

  test("sizeInBytes comes off the manifest (broadcast decisions see real sizes)") {
    val root = freshRoot("gfi_size")
    val m = mapping
    ManifestTable.merge(m.project(raw((1L to 20L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, schema, numBuckets = 4)
    val mf = ManifestTable.currentManifest(spark, root).get
    val onDisk = mf.entries.map(e => Files.size(Paths.get(root, e.relPath))).sum
    val t = ManifestTable.read(spark, root, schema)
    val stats = t.queryExecution.optimizedPlan.stats.sizeInBytes
    // exact up to the session's fileCompressionFactor scaling
    assert(stats >= BigInt(onDisk) && stats <= BigInt(onDisk) * 10,
      s"stats $stats vs disk $onDisk")
  }
}
