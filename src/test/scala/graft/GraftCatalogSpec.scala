package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

import graft.store.ManifestTable

/** The DSv2 TableCatalog face: named tables (`graft.db.t`) over the
  * same manifest state every path-based face reads. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val wh = "target/test-tmp/graft_catalog_wh"
  org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  spark.conf.set("spark.sql.catalog.graftcat", "graft.store.GraftCatalog")
  spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case r: ReusedExchangeExec => scans(r.child)
    case s: FileSourceScanExec => Seq(s)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  test("named-table lifecycle from pure SQL: create, insert (upsert), " +
      "overwrite, time travel, show, drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("""CREATE TABLE graftcat.db.users (id BIGINT, name STRING)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    assert(spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).toSeq == Seq("users"))
    // empty after CREATE
    assert(spark.sql("SELECT * FROM graftcat.db.users").count() == 0)
    // INSERT = key-matched merge
    spark.sql("INSERT INTO graftcat.db.users VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT name FROM graftcat.db.users ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // same key: UPSERT semantics (this is a keyed table)
    spark.sql("INSERT INTO graftcat.db.users VALUES (2, 'B2'), (3, 'c')")
    assert(spark.sql("SELECT name FROM graftcat.db.users ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "B2", "c"))
    // INSERT OVERWRITE replaces in one commit
    spark.sql("INSERT OVERWRITE graftcat.db.users VALUES (9, 'z')")
    assert(spark.sql("SELECT id, name FROM graftcat.db.users")
      .collect().map(_.mkString("|")).toSeq == Seq("9|z"))
    // every prior version stays readable by NAME
    val head = ManifestTable.currentVersion(spark, s"$wh/db/users").get
    assert(spark.sql(
        s"SELECT name FROM graftcat.db.users VERSION AS OF ${head - 1} " +
          "ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "B2", "c"))
    assert(spark.sql(
      s"SELECT * FROM graftcat.db.users VERSION AS OF 0").count() == 0)
    spark.sql("DROP TABLE graftcat.db.users")
    assert(spark.sql("SHOW TABLES IN graftcat.db").count() == 0)
  }

  test("a catalog table IS the path table: one manifest state, and key " +
      "predicates prune through the named read") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.events")
    spark.sql("""CREATE TABLE graftcat.db.events (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='8')""")
    spark.sql("INSERT INTO graftcat.db.events " +
      "SELECT id, id * 10 AS v FROM range(1, 201)")
    // the path faces read the SAME table
    val root = s"$wh/db/events"
    val viaPath = ManifestTable.read(spark, root,
      ManifestTable.recordedSchema(spark, root).get)
    assert(viaPath.count() == 200)
    assert(spark.sql("SELECT sum(v) FROM graftcat.db.events")
      .head.getLong(0) ==
      viaPath.agg(sum("v")).head.getLong(0))
    // key equality through the NAMED read prunes to one bucket file
    val q = spark.sql("SELECT v FROM graftcat.db.events WHERE id = 42")
    assert(scannedFiles(q) == 1,
      "named-table key lookup must hit GraftFileIndex pruning")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(420L))
    // numeric key RANGE prunes through the recorded key zones
    val r = spark.sql(
      "SELECT count(*) FROM graftcat.db.events WHERE id > 1000")
    assert(r.head.getLong(0) == 0L)
  }

  test("saveAsTable (CTAS) and DataFrame writeTo round-trip") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.ctas")
    (1L to 30L).map(i => (i, s"n$i")).toDF("id", "name")
      .write.saveAsTable("graftcat.db.ctas")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.ctas")
      .head.getLong(0) == 30L)
    // append through the writer API merges by key
    Seq((7L, "SEVEN"), (31L, "n31")).toDF("id", "name")
      .write.mode("append").saveAsTable("graftcat.db.ctas")
    val got = spark.sql(
      "SELECT name FROM graftcat.db.ctas WHERE id IN (7, 31) ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("SEVEN", "n31"))
    assert(spark.sql("SELECT count(*) FROM graftcat.db.ctas")
      .head.getLong(0) == 31L)
  }

  test("usage errors are loud: bad key, PARTITIONED BY, writes to a " +
      "travelled snapshot, unknown table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    val e1 = intercept[Exception] {
      spark.sql("""CREATE TABLE graftcat.db.bad (a BIGINT) USING graft
        TBLPROPERTIES ('key'='nope')""")
    }
    assert(e1.getMessage.contains("key column"))
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graftcat.db.bad2 (a BIGINT, d STRING)
        USING graft PARTITIONED BY (d)""")
    }
    assert(e2.getMessage.contains("bucket layout"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graftcat.db.never_created").collect()
    }
  }

  test("DELETE FROM by key, ALTER TABLE ADD COLUMNS, SHOW TBLPROPERTIES") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.dml")
    spark.sql("""CREATE TABLE graftcat.db.dml (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    spark.sql("INSERT INTO graftcat.db.dml " +
      "SELECT id, id * 2 FROM range(1, 51)")
    // key-equality and IN deletes: bucket-local rewrites
    spark.sql("DELETE FROM graftcat.db.dml WHERE id = 7")
    spark.sql("DELETE FROM graftcat.db.dml WHERE id IN (9, 11, 999)")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.dml")
      .head.getLong(0) == 47L)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.db.dml WHERE id IN (7, 9, 11)")
      .head.getLong(0) == 0L)
    // non-key predicate: the row-level rewrite path (r11 — previously a
    // refusal), full SQL DELETE semantics at touched-bucket cost
    spark.sql("DELETE FROM graftcat.db.dml WHERE v > 10")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.dml")
      .head.getLong(0) == 5L) // ids 1..5 keep v = 2..10
    // add-only evolution: metadata-only commit, old rows read NULL
    val vBefore = ManifestTable
      .currentVersion(spark, s"$wh/db/dml").get
    spark.sql("ALTER TABLE graftcat.db.dml ADD COLUMNS (tag STRING)")
    assert(ManifestTable.currentVersion(spark, s"$wh/db/dml")
      .contains(vBefore + 1), "evolution must be one metadata commit")
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.db.dml WHERE tag IS NULL")
      .head.getLong(0) == 5L)
    spark.sql("INSERT INTO graftcat.db.dml VALUES (100, 200, 'x')")
    assert(spark.sql(
      "SELECT tag FROM graftcat.db.dml WHERE id = 100")
      .head.getString(0) == "x")
    // DROP COLUMN: the DDL face of the r14 logical drop — the KEY
    // column refuses (table addressing); a non-key column drops as one
    // metadata-only commit and re-adding the same name refuses (the
    // `#drop:` claim — old bytes can never leak into a fresh column)
    val eKey = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.dml DROP COLUMN id")
    }
    assert(eKey.getMessage.contains("key column"), eKey.getMessage)
    val vDrop = ManifestTable.currentVersion(spark, s"$wh/db/dml").get
    spark.sql("ALTER TABLE graftcat.db.dml DROP COLUMN tag")
    assert(ManifestTable.currentVersion(spark, s"$wh/db/dml")
      .contains(vDrop + 1), "DROP COLUMN must be one metadata commit")
    assert(!spark.table("graftcat.db.dml")
      .schema.fieldNames.contains("tag"))
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.dml ADD COLUMNS (tag STRING)")
    }
    // properties surface the manifest's facts plus the registries:
    // tags, constraints, the declared maintenance policy (the memo is
    // per-handle — re-resolve after declaring)
    val dmlRoot = s"$wh/db/dml"
    ManifestTable.tag(spark, dmlRoot, "props_cut")
    ManifestTable.addConstraint(spark, dmlRoot, "v_pos",
      "v > 0 OR v IS NULL")
    ManifestTable.autoMaintain(spark, dmlRoot, zones = Seq("v"),
      compactFiles = 4, vacuumKeep = 3)
    spark.sql("REFRESH TABLE graftcat.db.dml")
    val props = spark.sql("SHOW TBLPROPERTIES graftcat.db.dml")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key").contains("id"))
    assert(props.get("numBuckets").contains("4"))
    assert(props.contains("version"))
    assert(props("tags").startsWith("props_cut=v"), props.toString)
    assert(props.get("constraints").contains("v_pos"))
    assert(props.get("autoMaintain").contains(
      "zones=v,compactFiles=4,vacuumKeep=3"))
    // unconditional DELETE = metadata-only truncate; history survives
    val vPre = ManifestTable.currentVersion(spark, s"$wh/db/dml").get
    spark.sql("DELETE FROM graftcat.db.dml")
    assert(spark.sql("SELECT count(*) FROM graftcat.db.dml")
      .head.getLong(0) == 0L)
    assert(spark.sql(
        s"SELECT count(*) FROM graftcat.db.dml VERSION AS OF $vPre")
      .head.getLong(0) == 6L, "truncate must keep time travel")
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only, SQL reads/writes and " +
      "key pruning follow the new name, time travel keeps the old one") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.ren")
    spark.sql("""CREATE TABLE graftcat.db.ren (id BIGINT, amount BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    spark.sql("INSERT INTO graftcat.db.ren " +
      "SELECT id, id * 10 FROM range(0, 40)")
    val root = s"$wh/db/ren"
    val vPre = ManifestTable.currentVersion(spark, root).get

    spark.sql("ALTER TABLE graftcat.db.ren RENAME COLUMN amount TO total")
    assert(ManifestTable.currentVersion(spark, root).contains(vPre + 1),
      "rename must be one metadata-only commit")
    assert(spark.table("graftcat.db.ren").schema.fieldNames.toSeq ==
      Seq("id", "total"))
    assert(spark.sql(
      "SELECT sum(total) FROM graftcat.db.ren").head.getLong(0) ==
      (0L until 40L).map(_ * 10).sum)

    // key rename: DML, upserts and plan-time file pruning follow
    spark.sql("ALTER TABLE graftcat.db.ren RENAME COLUMN id TO doc_id")
    spark.sql("INSERT INTO graftcat.db.ren VALUES (7, 777), (100, 1000)")
    spark.sql("UPDATE graftcat.db.ren SET total = 888 WHERE doc_id = 8")
    spark.sql("DELETE FROM graftcat.db.ren WHERE doc_id = 9")
    assert(spark.sql("SELECT total FROM graftcat.db.ren " +
      "WHERE doc_id IN (7, 8, 9, 100) ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(777L, 888L, 1000L))
    // the key predicate still prunes files through the index
    val pointRead = spark.sql(
      "SELECT total FROM graftcat.db.ren WHERE doc_id = 7")
    assert(scannedFiles(pointRead) <= 2,
      "post-rename key lookup must stay file-pruned")
    // MERGE INTO by the renamed key
    spark.sql("""MERGE INTO graftcat.db.ren t
      USING (SELECT 7 AS sid, 7000 AS stotal) s ON t.doc_id = s.sid
      WHEN MATCHED THEN UPDATE SET total = s.stotal
      WHEN NOT MATCHED THEN INSERT (doc_id, total) VALUES (s.sid, s.stotal)""")
    assert(spark.sql(
      "SELECT total FROM graftcat.db.ren WHERE doc_id = 7")
      .head.getLong(0) == 7000L)

    // time travel shows each version under its own names
    assert(spark.sql(
      s"SELECT * FROM graftcat.db.ren VERSION AS OF $vPre")
      .schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(spark.sql(s"SELECT sum(amount) FROM graftcat.db.ren " +
      s"VERSION AS OF $vPre").head.getLong(0) ==
      (0L until 40L).map(_ * 10).sum)
  }

  test("ALTER COLUMN TYPE: safe widening via SQL is metadata-only and " +
      "reads old files exact; narrowing and the key column refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.wid")
    spark.sql("""CREATE TABLE graftcat.db.wid (id INT, n INT, f FLOAT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    spark.sql("INSERT INTO graftcat.db.wid " +
      "SELECT CAST(id AS INT), CAST(id AS INT), CAST(id AS FLOAT) / 4 " +
      "FROM range(0, 20)")
    val root = s"$wh/db/wid"
    val vPre = ManifestTable.currentVersion(spark, root).get
    spark.sql("ALTER TABLE graftcat.db.wid ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE graftcat.db.wid ALTER COLUMN f TYPE DOUBLE")
    assert(ManifestTable.currentVersion(spark, root).contains(vPre + 2),
      "each widen must be one metadata-only commit")
    val sch = spark.table("graftcat.db.wid").schema
    assert(sch("n").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("f").dataType == org.apache.spark.sql.types.DoubleType)
    // old narrow files read back exact under the wide type, and a
    // post-widen write can exceed the narrow range
    spark.sql("INSERT INTO graftcat.db.wid VALUES " +
      "(100, 9000000000, 1.0000000116860974e-7)")
    assert(spark.sql("SELECT sum(n) FROM graftcat.db.wid")
      .head.getLong(0) == (0L until 20L).sum + 9000000000L)
    assert(spark.sql(
      "SELECT f FROM graftcat.db.wid WHERE id = 4").head.getDouble(0)
      == 1.0d, "float 1.0 must read back as exactly double 1.0")
    // narrowing refuses (Spark's analyzer catches the down-cast before
    // the catalog; widenColumn's own check covers the non-SQL API)
    val eNarrow = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.wid ALTER COLUMN n TYPE INT")
    }
    assert(eNarrow.getMessage.contains("not a safe widening") ||
      eNarrow.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      eNarrow.getMessage)
    // widening the KEY refuses in the catalog (analyzer up-cast lets
    // int→bigint through; bucket addressing hashes the native type)
    val eKey = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.wid ALTER COLUMN id TYPE BIGINT")
    }
    assert(eKey.getMessage.contains("key column"), eKey.getMessage)
  }

  test("streaming by NAME: writeStream.toTable upserts through the " +
      "merge; readStream.table streams the commits as upsert rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.stream_t")
    spark.sql("""CREATE TABLE graftcat.db.stream_t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    def fresh(n: String): String = {
      val d = s"target/test-tmp/$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      d
    }
    // write INTO the named table from a stream: key-matched upserts
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", fresh("cat_sink_ckpt"))
      .toTable("graftcat.db.stream_t")
    try {
      mem.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
      mem.addData((2L, 21L), (3L, 30L)); q.processAllAvailable()
    } finally q.stop()
    assert(spark.sql("SELECT id, v FROM graftcat.db.stream_t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 21L), (3L, 30L)),
      "streamed inserts must upsert by key")
    // read the named table AS a stream: history + live commits as
    // plain upsert rows
    val rq = spark.readStream
      .option("startingVersion", "earliest")
      .table("graftcat.db.stream_t")
      .writeStream.format("memory").queryName("cat_stream_out")
      .option("checkpointLocation", fresh("cat_src_ckpt"))
      .start()
    try {
      rq.processAllAvailable()
      spark.sql("INSERT INTO graftcat.db.stream_t VALUES (4, 40)")
      rq.processAllAvailable()
      val ids = spark.sql("SELECT DISTINCT id FROM cat_stream_out")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L),
        s"streamed table read missed commits: $ids")
    } finally rq.stop()
  }

  test("PATH identifiers (the Delta `cat.`/path`` form): full SQL " +
      "surface — SELECT, UPDATE, MERGE INTO, DELETE, time travel — on " +
      "a table that was never registered") {
    val root = "target/test-tmp/graft_catalog_pathident"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    ManifestTable.create(
      Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, "c", 7.0))
        .toDF("id", "name", "bal"),
      "id", root, numBuckets = 4)
    val t = s"graftcat.`$root`"
    // SELECT resolves the verbatim path — no warehouse prefix
    assert(spark.sql(s"SELECT name FROM $t ORDER BY id").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    // UPDATE through the SAME DML strategy catalog tables use
    spark.sql(s"UPDATE $t SET bal = bal + 100 WHERE id = 2")
    assert(spark.sql(s"SELECT bal FROM $t WHERE id = 2")
      .head.getDouble(0) == 95.0)
    // three-clause MERGE INTO
    spark.sql(s"""MERGE INTO $t t
      USING (SELECT * FROM VALUES (1L, 'A', 1.0), (9L, 'z', 9.0)
             AS s(id, name, bal)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET name = s.name, bal = s.bal + t.bal
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql(s"SELECT name, bal FROM $t WHERE id = 1")
      .head.mkString("|") == "A|11.0")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 4L)
    // DELETE, then time travel back across the whole DML history
    spark.sql(s"DELETE FROM $t WHERE id = 3")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 0")
      .head.getLong(0) == 3L)
    // a slashed name never collides with warehouse resolution: the
    // same catalog still serves its named tables
    assert(spark.sql("SHOW TABLES IN graftcat.db").count() >= 0)
  }

  test("rename moves the directory; namespaces list and drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.tmpns")
    spark.sql("DROP TABLE IF EXISTS graftcat.tmpns.a")
    spark.sql("DROP TABLE IF EXISTS graftcat.tmpns.b")
    spark.sql("""CREATE TABLE graftcat.tmpns.a (id BIGINT) USING graft""")
    spark.sql("INSERT INTO graftcat.tmpns.a VALUES (5)")
    spark.sql("ALTER TABLE graftcat.tmpns.a RENAME TO graftcat.tmpns.b")
    assert(spark.sql("SELECT id FROM graftcat.tmpns.b").head.getLong(0) == 5L)
    assert(!new java.io.File(s"$wh/tmpns/a").exists())
    spark.sql("DROP TABLE graftcat.tmpns.b")
    spark.sql("DROP NAMESPACE graftcat.tmpns")
    assert(!new java.io.File(s"$wh/tmpns").exists())
  }

  test("a table root is NEVER a namespace: DROP NAMESPACE on a table " +
      "raises instead of cascading into its data, and a rename into a " +
      "nonexistent namespace raises instead of relocating the table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.nsdb")
    spark.sql("DROP TABLE IF EXISTS graftcat.nsdb.guard_t")
    spark.sql("""CREATE TABLE graftcat.nsdb.guard_t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id')""")
    spark.sql("INSERT INTO graftcat.nsdb.guard_t VALUES (1, 10)")
    // DROP NAMESPACE aimed at the TABLE path must not vouch for it
    val e1 = intercept[Exception] {
      spark.sql("DROP NAMESPACE graftcat.nsdb.guard_t CASCADE")
    }
    assert(e1.getMessage.toLowerCase.matches("(?s).*(namespace|schema).*"),
      e1.getMessage)
    assert(spark.sql("SELECT v FROM graftcat.nsdb.guard_t")
      .head.getLong(0) == 10L, "the table's data must survive")
    // rename into a namespace that does not exist must raise, not
    // mkdir a phantom directory the catalog cannot resolve
    val e2 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graftcat.nsdb.guard_t RENAME TO graftcat.nope.t2")
    }
    assert(e2.getMessage.toLowerCase.matches("(?s).*(namespace|schema).*"),
      e2.getMessage)
    assert(spark.sql("SELECT count(*) FROM graftcat.nsdb.guard_t")
      .head.getLong(0) == 1L, "a failed rename must leave the table")
    spark.sql("DROP TABLE graftcat.nsdb.guard_t")
  }

  test("CREATE TABLE with an invalid constraint property fails BEFORE " +
      "anything commits — no half-created table blocks the retry") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.nsdb")
    spark.sql("DROP TABLE IF EXISTS graftcat.nsdb.badc_t")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graftcat.nsdb.badc_t (id BIGINT, v BIGINT)
        USING graft
        TBLPROPERTIES ('key'='id', 'constraint.c'='no_such_col > 0')""")
    }
    assert(e.getMessage.contains("no_such_col"), e.getMessage)
    // the corrected CREATE must succeed — nothing was left behind
    spark.sql("""CREATE TABLE graftcat.nsdb.badc_t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'constraint.c'='v > 0')""")
    spark.sql("INSERT INTO graftcat.nsdb.badc_t VALUES (1, 5)")
    assert(spark.sql("SELECT v FROM graftcat.nsdb.badc_t")
      .head.getLong(0) == 5L)
    spark.sql("DROP TABLE graftcat.nsdb.badc_t")
  }

  test("a TOMBSTONE delete refuses the upserts-only streaming table " +
      "read (delta deletes add entries, remove none — they must not " +
      "slip past the delete guard)") {
    import org.apache.spark.sql.types._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.nsdb")
    spark.sql("DROP TABLE IF EXISTS graftcat.nsdb.tomb_t")
    spark.sql("""CREATE TABLE graftcat.nsdb.tomb_t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='2')""")
    spark.sql(
      "INSERT INTO graftcat.nsdb.tomb_t VALUES (1, 10), (2, 20), (3, 30)")
    def fresh(n: String): String = {
      val d = s"target/test-tmp/$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      d
    }
    val rq = spark.readStream
      .option("startingVersion", "earliest")
      .table("graftcat.nsdb.tomb_t")
      .writeStream.format("memory").queryName("tomb_stream_out")
      .option("checkpointLocation", fresh("tomb_src_ckpt"))
      .start()
    try {
      rq.processAllAvailable()
      // TOMBSTONE delete: adds key-only files, removes nothing
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      ManifestTable.delete(spark, s"$wh/nsdb/tomb_t", schema, "id",
        Seq(2L), token = 99L, delta = true)
      val e = intercept[Exception] { rq.processAllAvailable() }
      def rootMsg(t: Throwable): String =
        Option(t.getCause).map(rootMsg)
          .getOrElse(String.valueOf(t.getMessage))
      assert((e.getMessage + rootMsg(e)).contains("upserts only"),
        s"a tombstone delete must refuse loudly: ${e.getMessage}")
    } finally rq.stop()
  }
}
