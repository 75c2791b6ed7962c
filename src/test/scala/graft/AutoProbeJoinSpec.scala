package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{AutoProbeJoin, ManifestTable, SecondaryIndex}

/** [[graft.store.AutoProbeJoin]] — AUTOMATIC dim-driven dynamic file
  * pruning. The explicit API's contract lives in ProbeJoinSpec; these
  * specs pin the optimizer-rule face: a plain `fact.join(dim)` over the
  * v2 read prunes to the dim keys' buckets with NO api call, every
  * guarded shape (outer-preserved fact, over-cap, unstable dim, big
  * dim) stays on the unpruned plan, and values always equal the
  * rule-disabled control. */
class AutoProbeJoinSpec extends SparkSpec {
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

  private def mkTable(root: String, n: Int = 16): Unit =
    ManifestTable.create(
      (1L to 400L).map(i => (i, i * 10)).toDF("id", "v"),
      "id", root, numBuckets = n)

  private def face(root: String): DataFrame =
    spark.read.format("graft").load(root)

  private def dim(keys: Long*): DataFrame =
    keys.map(k => (k, s"d$k")).toDF("cust", "tag")

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case r: ReusedExchangeExec => scans(r.child)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  /** Files read by the FACT table's scan (scans rooted elsewhere — a
    * parquet dim's own — don't count). */
  private def scannedFiles(df: DataFrame, root: String): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .endsWith("/" + new java.io.File(root).getName)))
      .map(_.metrics("numFiles").value).sum
  }

  /** Rows under the rule vs rows with the rule disabled (the control
    * recomputes the SAME DataFrame expression via `mk`). */
  private def sameAsControl(mk: => DataFrame, sort: String*): Unit = {
    val got = mk.orderBy(sort.map(col): _*).collect().toSeq
    spark.conf.set(AutoProbeJoin.EnabledKey, "false")
    try {
      val want = mk.orderBy(sort.map(col): _*).collect().toSeq
      assert(got == want, s"pruned rows diverge from control:\n" +
        s"got  ${got.take(5)}...\nwant ${want.take(5)}...")
    } finally spark.conf.unset(AutoProbeJoin.EnabledKey)
  }

  test("a plain inner join against a small dim prunes to the dim keys' " +
      "files — no API call") {
    val root = freshRoot("apj_inner")
    mkTable(root)
    def q = face(root).join(dim(3L, 17L, 99L), col("id") === col("cust"))
    assert(q.count() == 3)
    assert(scannedFiles(q, root) <= 3,
      "3 probe keys must touch at most 3 of 16 buckets' files")
    sameAsControl(q, "id")
    // the control really is unpruned (the fixture isn't trivially tiny)
    spark.conf.set(AutoProbeJoin.EnabledKey, "false")
    try assert(scannedFiles(q, root) == 16)
    finally spark.conf.unset(AutoProbeJoin.EnabledKey)
  }

  test("a filtered file-backed dim — the DPP shape — prunes too") {
    val root = freshRoot("apj_filedim")
    mkTable(root)
    val dimRoot = freshRoot("apj_filedim_dim")
    (1L to 200L).map(i => (i, i % 50)).toDF("cust", "w")
      .write.mode("overwrite").parquet(dimRoot)
    def q = face(root).join(
      spark.read.parquet(dimRoot).filter(col("w") === 7), // 4 keys
      col("id") === col("cust"))
    assert(q.count() == 4)
    assert(scannedFiles(q, root) < 16, "selective file-backed dim must prune")
    sameAsControl(q, "id")
  }

  test("left_semi prunes; dup dim keys still multiply inner output") {
    val root = freshRoot("apj_semi")
    mkTable(root)
    val d = dim(7L, 7L, 8L)
    def semi = face(root).join(d, col("id") === col("cust"), "left_semi")
    assert(semi.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((7L, 70L), (8L, 80L)))
    assert(scannedFiles(semi, root) <= 2)
    def inner = face(root).join(d, col("id") === col("cust"))
    assert(inner.count() == 3) // dup dim rows multiply like a plain join
  }

  test("SQL `key IN (subquery)` prunes too: the subquery rewrites to a " +
      "left-semi join before the rule's batch runs") {
    val root = freshRoot("apj_insub")
    mkTable(root)
    face(root).createOrReplaceTempView("apj_insub_fact")
    dim(3L, 17L).createOrReplaceTempView("apj_insub_dim")
    def q = spark.sql("""SELECT id, v FROM apj_insub_fact
      WHERE id IN (SELECT cust FROM apj_insub_dim)""")
    assert(q.orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((3L, 30L), (17L, 170L)))
    assert(scannedFiles(q, root) <= 2,
      "an IN-subquery point lookup must not scan the table")
  }

  test("outer joins prune only the non-preserved fact side") {
    val root = freshRoot("apj_outer")
    mkTable(root, n = 8)
    val d = dim(5L, 9999L) // one hit, one miss
    // fact LEFT-outer-preserved: every fact row must survive — no prune
    def keepFact = face(root)
      .join(d, col("id") === col("cust"), "left_outer")
    assert(keepFact.count() == 400)
    assert(scannedFiles(keepFact, root) == 8)
    sameAsControl(keepFact, "id", "cust")
    // dim preserved, fact droppable: prunes, unmatched dim row NULL-pads
    def keepDim = d.join(face(root), col("id") === col("cust"),
      "left_outer")
    assert(keepDim.count() == 2)
    assert(scannedFiles(keepDim, root) <= 1)
    sameAsControl(keepDim, "cust")
  }

  test("over the key cap the plan stays unchanged (a truncated probe " +
      "set would drop matching rows)") {
    val root = freshRoot("apj_cap")
    mkTable(root, n = 8)
    spark.conf.set(AutoProbeJoin.MaxKeysKey, "3")
    try {
      def q = face(root).join(dim(1L, 2L, 3L, 4L, 5L),
        col("id") === col("cust"))
      assert(q.count() == 5)
      assert(scannedFiles(q, root) == 8, "over-cap must not prune")
    } finally spark.conf.unset(AutoProbeJoin.MaxKeysKey)
  }

  test("unstable or unselective dims never probe: nondeterministic " +
      "filter, LIMIT, big dim, no-filter scan") {
    val root = freshRoot("apj_guards")
    mkTable(root, n = 8)
    val dimRoot = freshRoot("apj_guards_dim")
    (1L to 3L).map(i => (i, i)).toDF("cust", "w")
      .write.mode("overwrite").parquet(dimRoot)
    // nondeterministic dim filter: the dim executes twice — probing
    // would freeze one outcome and join another. (Two shapes DON'T
    // exercise this guard because the optimizer removes the
    // nondeterminism before the rule runs: a rand-filtered
    // LocalRelation gets EVALUATED into fixed rows, and a provably-true
    // comparison like rand >= 0 is simplified away — so the dim must be
    // file-backed with a filter that can actually cut rows.)
    def nd = face(root).join(
      spark.read.parquet(dimRoot).filter(rand(7) < 0.999),
      col("id") === col("cust"))
    assert(scannedFiles(nd, root) == 8)
    // LIMIT on the dim: row selection is not stable across executions
    // (file-backed again — a limit over a LocalRelation folds to fixed
    // rows before the rule runs)
    def lim = face(root).join(spark.read.parquet(dimRoot).limit(2),
      col("id") === col("cust"))
    assert(scannedFiles(lim, root) == 8)
    // dim over the size threshold
    spark.conf.set(AutoProbeJoin.MaxDimBytesKey, "1")
    try {
      def big = face(root).join(dim(1L, 2L), col("id") === col("cust"))
      assert(scannedFiles(big, root) == 8)
    } finally spark.conf.unset(AutoProbeJoin.MaxDimBytesKey)
    // a bare file scan as dim (no Filter, no LocalRelation): no
    // selectivity signal — DPP discipline says don't pay the probe
    def scan = face(root).join(spark.read.parquet(dimRoot),
      col("id") === col("cust"))
    assert(scannedFiles(scan, root) == 8)
  }

  test("an empty probe set collapses the fact side to zero I/O") {
    val root = freshRoot("apj_empty")
    mkTable(root)
    def q = face(root).join(dim(1L, 2L).filter(col("cust") > 100),
      col("id") === col("cust"))
    assert(q.count() == 0)
    assert(scannedFiles(q, root) == 0, "no candidate keys → no files read")
  }

  test("catalog-face SQL join prunes and matches the control") {
    val root = "target/test-tmp/apj_wh" // catalog warehouse = fact root
    spark.conf.set("spark.sql.catalog.apjcat", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.apjcat.warehouse", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS apjcat.db")
    spark.sql("DROP TABLE IF EXISTS apjcat.db.fact")
    spark.sql("""CREATE TABLE apjcat.db.fact (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='16')""")
    (1L to 400L).map(i => (i, i * 10)).toDF("id", "v")
      .createOrReplaceTempView("apj_src")
    spark.sql("INSERT INTO apjcat.db.fact SELECT * FROM apj_src")
    dim(3L, 17L, 99L).createOrReplaceTempView("apj_dim")
    def q = spark.sql("""SELECT f.id, f.v, d.tag
      FROM apjcat.db.fact f JOIN apj_dim d ON f.id = d.cust""")
    assert(q.count() == 3)
    assert(scannedFiles(q, root) <= 3)
    sameAsControl(q, "id")
  }

  test("comparator table: pruning keeps raw-equality join semantics " +
      "(files probed via the normalized key, rows filtered raw)") {
    val root = freshRoot("apj_cmp")
    ManifestTable.create(
      Seq(("Foo", 1L), ("BAR", 2L), ("baz", 3L)).toDF("k", "v"),
      "k", root, numBuckets = 4, keyComparator = lower(_))
    val d = Seq(("BAR", "y"), ("FOO", "x")).toDF("cust", "tag")
    def q = face(root).join(d, col("k") === col("cust"))
    // raw equality: only the exact-case "BAR" matches — and that is
    // exactly what the plain join gives too
    assert(q.select("k", "tag").collect().toSeq.map(r =>
      (r.getString(0), r.getString(1))) == Seq(("BAR", "y")))
    sameAsControl(q, "k")
  }

  test("time travel: the pruned join answers at the travelled version") {
    val root = freshRoot("apj_travel")
    mkTable(root, n = 8)
    // v1: rewrite key 5's value
    Seq((5L, 5000L)).toDF("id", "v")
      .write.format("graft").option("key", "id").mode("append").save(root)
    val d = dim(5L)
    def now = face(root).join(d, col("id") === col("cust"))
    def old = spark.read.format("graft").option("versionAsOf", "0")
      .load(root).join(d, col("id") === col("cust"))
    assert(now.select("v").as[Long].head() == 5000L)
    assert(old.select("v").as[Long].head() == 50L)
    assert(scannedFiles(old, root) <= 2)
  }

  private val emailSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("email", StringType)))

  test("a registered secondary index serves non-key equi-joins: " +
      "pruned while fresh, declined while lagging, pruned again " +
      "after refresh") {
    val root = freshRoot("apj_ix")
    val ixRoot = freshRoot("apj_ix_side")
    ManifestTable.create(
      (1L to 400L).map(i => (i, s"u${i % 100}")).toDF("id", "email"),
      "id", root, numBuckets = 16)
    val ix = SecondaryIndex.Index(root, emailSchema, "id", ixRoot,
      "email", 4)
    SecondaryIndex.create(spark, ix) // auto-registers on the base
    val d = Seq(("u7", 1), ("u13", 2)).toDF("demail", "w")
    def q = face(root).join(d, col("email") === col("demail"))
    assert(q.count() == 8) // 2 values x 4 keys each
    assert(scannedFiles(q, root) <= 8,
      "8 resolved keys must not scan all 16 buckets")
    sameAsControl(q, "id")
    // a base commit the index has NOT applied: the leg must decline —
    // pruning by a lagging index would hide the new row
    Seq((401L, "u7")).toDF("id", "email")
      .write.format("graft").option("key", "id").mode("append").save(root)
    def q2 = face(root).join(d, col("email") === col("demail"))
    assert(q2.count() == 9, "the unindexed new row must appear")
    assert(scannedFiles(q2, root) == 16, "a lagging index must not prune")
    // refresh catches the index up: pruning resumes, new row included
    SecondaryIndex.refresh(spark, ix)
    def q3 = face(root).join(d, col("email") === col("demail"))
    assert(q3.count() == 9)
    assert(scannedFiles(q3, root) <= 9)
    sameAsControl(q3, "id")
  }

  test("the index leg pins the snapshot: a commit landing between " +
      "planning and execution does not surface half-indexed state") {
    val root = freshRoot("apj_ixpin")
    val ixRoot = freshRoot("apj_ixpin_side")
    ManifestTable.create(
      (1L to 100L).map(i => (i, s"u${i % 10}")).toDF("id", "email"),
      "id", root, numBuckets = 8)
    SecondaryIndex.create(spark,
      SecondaryIndex.Index(root, emailSchema, "id", ixRoot, "email", 4))
    val d = Seq(("u3", 1)).toDF("demail", "w")
    val q = face(root).join(d, col("email") === col("demail"))
    val planned = q.queryExecution.executedPlan // probes + pins here
    Seq((101L, "u3")).toDF("id", "email")
      .write.format("graft").option("key", "id").mode("append").save(root)
    // the held plan serves the PINNED pre-commit snapshot: 10 rows
    assert(planned.executeCollect().length == 10,
      "a pinned plan must not mix the post-commit base with " +
        "pre-commit index answers")
    // ANY fresh action re-plans from the (un-pinned) analyzed plan:
    // the rule declines (the index lags) and the live read shows the
    // new row — on the same Dataset and on a rebuilt one alike
    assert(q.count() == 11)
    def fresh = face(root).join(d, col("email") === col("demail"))
    assert(fresh.count() == 11)
  }

  test("index registry: newest registration per value set wins, " +
      "dropped index roots are skipped") {
    val root = freshRoot("apj_reg")
    val ixRootA = freshRoot("apj_reg_a")
    val ixRootB = freshRoot("apj_reg_b")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"u$i")).toDF("id", "email"),
      "id", root, numBuckets = 4)
    SecondaryIndex.create(spark,
      SecondaryIndex.Index(root, emailSchema, "id", ixRootA, "email", 4))
    val first = SecondaryIndex.registered(spark, root, emailSchema)
    assert(first.map(i => (i.valueCols, i.indexRoot)) ==
      Seq((Seq("email"), ixRootA)))
    // re-register the same value set at a new root: newest wins
    SecondaryIndex.create(spark,
      SecondaryIndex.Index(root, emailSchema, "id", ixRootB, "email", 8))
    val second = SecondaryIndex.registered(spark, root, emailSchema)
    assert(second.map(i => (i.indexRoot, i.numBuckets)) ==
      Seq((ixRootB, 8)))
    // SQL face: graft_indexes lists the registry with freshness
    val listed = spark.sql("SELECT * FROM graft_indexes(" +
      s"'$root', 'id BIGINT, email STRING')").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1), r.getInt(2),
      r.getBoolean(6))).toSeq == Seq(("email", ixRootB, 8, true)))
    // a dropped index root resolves to nothing
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(ixRootB))
    assert(SecondaryIndex.registered(spark, root, emailSchema).isEmpty)
    assert(spark.sql("SELECT * FROM graft_indexes(" +
      s"'$root', 'id BIGINT, email STRING')").count() == 0)
  }

  test("the pre-pushdown relation shape (extension-injected sessions) " +
      "injects the same filter") {
    val root = freshRoot("apj_prepush")
    mkTable(root, n = 8)
    val q = face(root).join(dim(3L, 17L), col("id") === col("cust"))
    // the analyzed plan still holds the bare DataSourceV2Relation —
    // exactly what an extension-injected session's optimizer batch sees
    val rule = new AutoProbeJoin(spark)
    val out = rule(q.queryExecution.analyzed)
    val injected = out.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[org.apache.spark.sql.execution
            .datasources.v2.DataSourceV2Relation] => f
    }
    assert(injected.size == 1, out.treeString)
    assert(injected.head.condition.toString.contains("IN"),
      injected.head.condition.toString)
    // idempotent: the probed tag stops a second pass
    assert(rule(out) eq out)
  }
}
