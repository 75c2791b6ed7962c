package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{AutoIndexFilter, AutoProbeJoin, ManifestTable,
  SecondaryIndex}

/** [[graft.store.AutoIndexFilter]] — plain literal predicates on a
  * registered indexed column become bounded key probes: pruned while
  * the index is fresh, plain scans while it lags, always equal to the
  * rule-disabled control. */
class AutoIndexFilterSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("email", StringType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def face(root: String): DataFrame =
    spark.read.format("graft").load(root)

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case r: ReusedExchangeExec => scans(r.child)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  private def scannedFiles(df: DataFrame, root: String): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .endsWith("/" + new java.io.File(root).getName)))
      .map(_.metrics("numFiles").value).sum
  }

  private def sameAsControl(mk: => DataFrame, sort: String*): Unit = {
    val got = mk.orderBy(sort.map(col): _*).collect().toSeq
    spark.conf.set(AutoIndexFilter.EnabledKey, "false")
    try {
      val want = mk.orderBy(sort.map(col): _*).collect().toSeq
      assert(got == want, s"rewritten rows diverge from control:\n" +
        s"got  ${got.take(5)}...\nwant ${want.take(5)}...")
    } finally spark.conf.unset(AutoIndexFilter.EnabledKey)
  }

  private def mkIndexed(root: String, ixRoot: String,
      n: Int = 16): SecondaryIndex.Index = {
    ManifestTable.create(
      (1L to 400L).map(i => (i, s"u${i % 100}")).toDF("id", "email"),
      "id", root, numBuckets = n)
    val ix = SecondaryIndex.Index(root, schema, "id", ixRoot, "email", 4)
    SecondaryIndex.create(spark, ix)
    ix
  }

  test("a point predicate on an indexed column reads only the value's " +
      "keys' buckets") {
    val root = freshRoot("aif_point")
    mkIndexed(root, freshRoot("aif_point_ix"))
    def q = face(root).filter(col("email") === "u7") // keys 7,107,207,307
    assert(q.count() == 4)
    assert(scannedFiles(q, root) <= 4,
      "4 keys must not scan all 16 buckets")
    sameAsControl(q, "id")
    spark.conf.set(AutoIndexFilter.EnabledKey, "false")
    try assert(scannedFiles(q, root) == 16, "control must full-scan")
    finally spark.conf.unset(AutoIndexFilter.EnabledKey)
    // SQL face, IN-list shape
    face(root).createOrReplaceTempView("aif_point_v")
    def sqlq = spark.sql(
      "SELECT id FROM aif_point_v WHERE email IN ('u7', 'u13')")
    assert(sqlq.count() == 8)
    assert(scannedFiles(sqlq, root) <= 8)
  }

  test("a value absent from a FRESH index proves absence: zero I/O") {
    val root = freshRoot("aif_absent")
    mkIndexed(root, freshRoot("aif_absent_ix"))
    def q = face(root).filter(col("email") === "nobody")
    assert(q.count() == 0)
    assert(scannedFiles(q, root) == 0)
  }

  test("a lagging index declines; refresh resumes; the original " +
      "predicate still filters rows exactly") {
    val root = freshRoot("aif_lag")
    val ix = mkIndexed(root, freshRoot("aif_lag_ix"), n = 8)
    Seq((401L, "u7")).toDF("id", "email")
      .write.format("graft").option("key", "id").mode("append").save(root)
    def q = face(root).filter(col("email") === "u7")
    assert(q.count() == 5, "the unindexed new row must appear")
    assert(scannedFiles(q, root) == 8, "a lagging index must not rewrite")
    SecondaryIndex.refresh(spark, ix)
    def q2 = face(root).filter(col("email") === "u7")
    assert(q2.count() == 5)
    assert(scannedFiles(q2, root) <= 5)
    sameAsControl(q2, "id")
  }

  test("range predicates serve through a range-layout index, " +
      "strictness kept row-level") {
    val root = freshRoot("aif_range")
    val ixRoot = freshRoot("aif_range_ix")
    ManifestTable.create(
      (1L to 400L).map(i => (i, f"u${i % 100}%03d")).toDF("id", "email"),
      "id", root, numBuckets = 16)
    val ix = SecondaryIndex.Index(root, schema, "id", ixRoot,
      Seq("email"), numBuckets = 4, rangeLayout = true)
    SecondaryIndex.create(spark, ix)
    // u010 <= email < u013: values u010,u011,u012 → 12 keys
    def q = face(root)
      .filter(col("email") >= "u010" && col("email") < "u013")
    assert(q.count() == 12)
    assert(scannedFiles(q, root) <= 12)
    sameAsControl(q, "id")
    // a hash-layout index refuses ranges: the probe declines, plain scan
    val root2 = freshRoot("aif_range_hash")
    mkIndexed(root2, freshRoot("aif_range_hash_ix"), n = 8)
    def q2 = face(root2)
      .filter(col("email") >= "u1" && col("email") <= "u2")
    assert(scannedFiles(q2, root2) == 8)
    sameAsControl(q2, "id")
  }

  test("the key cap declines a hot value; a user key predicate " +
      "suppresses the rewrite") {
    val root = freshRoot("aif_cap")
    mkIndexed(root, freshRoot("aif_cap_ix"), n = 8)
    spark.conf.set(AutoProbeJoin.MaxKeysKey, "3")
    try {
      def hot = face(root).filter(col("email") === "u7") // 4 keys > 3
      assert(hot.count() == 4)
      assert(scannedFiles(hot, root) == 8, "over-cap must not rewrite")
    } finally spark.conf.unset(AutoProbeJoin.MaxKeysKey)
    // an explicit key IN already prunes natively — no index probe rides
    // on top (alreadyConstrained on the key attribute)
    def keyed = face(root)
      .filter(col("id").isin(7L, 107L) && col("email") === "u7")
    assert(keyed.count() == 2)
    assert(scannedFiles(keyed, root) <= 2)
    sameAsControl(keyed, "id")
  }

  test("a table holding a NULL-keyed row never serves through the " +
      "index — the row is invisible to any index, a plain scan is not") {
    val root = freshRoot("aif_nullkey")
    val ixRoot = freshRoot("aif_nullkey_ix")
    val rows = (1L to 100L).map(i => (Option(i), s"u${i % 10}")) :+
      ((Option.empty[Long], "u3"))
    ManifestTable.create(rows.toDF("id", "email"), "id", root,
      numBuckets = 8)
    // the per-file stat records exactly the null-carrying bucket
    val m = ManifestTable.currentManifest(spark, root).get
    assert(m.entries.exists(_.nullKeys), "the null row's file must flag")
    assert(!m.entries.forall(_.nullKeys), "clean files must not")
    SecondaryIndex.create(spark,
      SecondaryIndex.Index(root, schema, "id", ixRoot, "email", 4))
    def q = face(root).filter(col("email") === "u3")
    assert(q.count() == 11, "the NULL-keyed matching row must appear")
    assert(scannedFiles(q, root) == 8,
      "a maybe-null-keyed table must not rewrite through the index")
    sameAsControl(q, "id")
  }

  test("a composite index serves multi-column point predicates and " +
      "small IN-list products; partial coverage or a large product " +
      "stays on the plain scan") {
    val root = freshRoot("aif_comp")
    val ixRoot = freshRoot("aif_comp_ix")
    val s3 = StructType(Seq(
      StructField("id", LongType),
      StructField("email", StringType),
      StructField("tier", StringType)))
    ManifestTable.create(
      (1L to 400L).map(i => (i, s"u${i % 10}", s"t${i % 3}"))
        .toDF("id", "email", "tier"),
      "id", root, numBuckets = 16)
    SecondaryIndex.create(spark, SecondaryIndex.Index(root, s3, "id",
      ixRoot, Seq("email", "tier"), numBuckets = 4))
    // i % 10 == 7 && i % 3 == 2: 17, 47, 77, ... — every 30
    def q = face(root)
      .filter(col("email") === "u7" && col("tier") === "t2")
    val expect = (1L to 400L).count(i => i % 10 == 7 && i % 3 == 2)
    assert(q.count() == expect)
    assert(scannedFiles(q, root) < 16,
      "a composite point predicate must prune through the index")
    sameAsControl(q, "id")
    // an impossible combination proves absence through the index
    def none = face(root)
      .filter(col("email") === "u7" && col("tier") === "no")
    assert(none.count() == 0)
    assert(scannedFiles(none, root) == 0)
    // a small IN-list PRODUCT serves through the tuple fan-out:
    // 2 emails × 1 tier = 2 probe tuples, one pruned index lookup
    def inq = face(root)
      .filter(col("email").isin("u7", "u8") && col("tier") === "t2")
    val inExpect = (1L to 400L).count(i =>
      (i % 10 == 7 || i % 10 == 8) && i % 3 == 2)
    assert(inq.count() == inExpect)
    assert(scannedFiles(inq, root) < 16,
      "a small IN-list product must prune through the index")
    sameAsControl(inq, "id")
    // a LARGE product declines BEFORE probing (tuple count > maxKeys)
    spark.conf.set(AutoProbeJoin.MaxKeysKey, "3")
    try {
      def big = face(root)
        .filter(col("email").isin("u1", "u2", "u3") &&
          col("tier").isin("t0", "t2"))
      assert(big.count() == (1L to 400L).count(i =>
        Set(1L, 2L, 3L)(i % 10) && (i % 3 == 0 || i % 3 == 2)))
      assert(scannedFiles(big, root) == 16,
        "a 6-tuple product over cap 3 must not rewrite")
      sameAsControl(big, "id")
    } finally spark.conf.unset(AutoProbeJoin.MaxKeysKey)
    // partial coverage (email only): the composite index cannot serve
    // a one-column predicate — plain scan
    def part = face(root).filter(col("email") === "u7")
    assert(part.count() == 40)
    assert(scannedFiles(part, root) == 16)
    sameAsControl(part, "id")
  }

  test("the rewrite pins the snapshot: a commit landing between " +
      "planning and execution stays invisible to the held plan") {
    val root = freshRoot("aif_pin")
    mkIndexed(root, freshRoot("aif_pin_ix"), n = 8)
    val q = face(root).filter(col("email") === "u7")
    val planned = q.queryExecution.executedPlan // probes + pins here
    Seq((401L, "u7")).toDF("id", "email")
      .write.format("graft").option("key", "id").mode("append").save(root)
    assert(planned.executeCollect().length == 4,
      "the pinned plan must serve the planned snapshot")
    assert(q.count() == 5, "a fresh action sees the commit (and the " +
      "lagging index declines)")
  }
}
