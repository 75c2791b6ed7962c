package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** [[ManifestTable.addConstraint]] — declared CHECK constraints:
  * validated against the current state at declaration, then enforced
  * inline on every row any writer produces through the one shared
  * write funnel; the first violating row fails the write loudly
  * before anything commits. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("seg", StringType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mapping = {
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("seg"); m.auto("v")
    m.complete(schema)
    m
  }

  private def mergeRows(root: String, batch: Long,
      rows: (Long, String, String)*): Unit = {
    val m = mapping
    val raw = rows.zipWithIndex
      .map { case ((id, sg, vv), i) =>
        (Seq(id.toString, sg, vv), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw), batch, m, root, schema,
      streamId = "cons-spec")
  }

  private def chain(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: chain(t.getCause)

  private def messageChain(e: Throwable): String =
    chain(e).map(t => String.valueOf(t.getMessage)).mkString(" | ")

  test("declaration validates the CURRENT state: violations refuse " +
      "loudly with a count and sample; typos and non-boolean " +
      "expressions fail analysis") {
    val root = freshRoot("cons_decl")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"d$i", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    // a constraint the data already violates (v <= 50 everywhere,
    // so v > 10 has 10 violating rows: 1..10)
    val e = intercept[IllegalStateException] {
      ManifestTable.addConstraint(spark, root, "v_gt10", "v > 10")
    }
    assert(e.getMessage.contains("10 existing row(s)") &&
      e.getMessage.contains("v_gt10"), e.getMessage)
    assert(ManifestTable.constraintsOf(spark, root).isEmpty,
      "a refused declaration must not register")
    // typo column → loud analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      ManifestTable.addConstraint(spark, root, "typo", "no_such > 0")
    }
    // non-boolean expression → loud analysis error
    intercept[org.apache.spark.sql.AnalysisException] {
      ManifestTable.addConstraint(spark, root, "notbool", "v + 1")
    }
    // a satisfied constraint registers
    ManifestTable.addConstraint(spark, root, "v_pos", "v > 0")
    assert(ManifestTable.constraintsOf(spark, root) ==
      Map("v_pos" -> "v > 0"))
  }

  test("enforcement at the write funnel: a violating merge fails " +
      "naming the constraint, nothing commits; NULL passes (SQL " +
      "CHECK); drop relaxes") {
    val root = freshRoot("cons_enforce")
    ManifestTable.create(
      (1L to 50L).map(i => (i, s"d$i", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    ManifestTable.addConstraint(spark, root, "v_pos", "v > 0")
    val v0 = ManifestTable.currentVersion(spark, root).get
    val e = intercept[Exception] {
      mergeRows(root, 1L, (60L, "ok", "5"), (61L, "bad", "-3"))
    }
    assert(messageChain(e).contains("v_pos"),
      s"the failure must name the constraint: ${messageChain(e)}")
    assert(ManifestTable.currentVersion(spark, root).get == v0,
      "a violating write must not commit")
    assert(ManifestTable.read(spark, root, schema).count() == 50L)
    // NULL in the checked column passes (CHECK semantics)
    mergeRows(root, 2L, (62L, "nullv", ""))
    assert(ManifestTable.read(spark, root, schema)
      .filter(col("id") === 62L).head.isNullAt(2))
    // a key-only tombstone write skips payload checks (nothing to
    // evaluate them on) — deletes stay cheap under constraints
    ManifestTable.delete(spark, root, schema, "id", Seq(5L),
      token = 9L, delta = true)
    assert(ManifestTable.read(spark, root, schema).count() == 50L)
    // drop, then the formerly-violating merge passes
    ManifestTable.dropConstraint(spark, root, "v_pos")
    mergeRows(root, 3L, (61L, "bad", "-3"))
    assert(ManifestTable.read(spark, root, schema)
      .filter(col("id") === 61L).head.getLong(2) == -3L)
  }

  test("clones inherit the contract; relaxing the branch leaves the " +
      "source enforced") {
    val src = freshRoot("cons_clone_src")
    val dst = freshRoot("cons_clone_dst")
    ManifestTable.create(
      (1L to 20L).map(i => (i, s"d$i", i)).toDF("id", "seg", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.addConstraint(spark, src, "v_pos", "v > 0")
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    assert(ManifestTable.constraintsOf(spark, dst) ==
      Map("v_pos" -> "v > 0"), "the clone inherits constraints")
    val e = intercept[Exception] {
      mergeRows(dst, 1L, (30L, "bad", "-1"))
    }
    assert(messageChain(e).contains("v_pos"))
    ManifestTable.dropConstraint(spark, dst, "v_pos")
    mergeRows(dst, 2L, (30L, "bad", "-1"))
    assert(ManifestTable.read(spark, dst, schema).count() == 21L)
    // the SOURCE still enforces
    val e2 = intercept[Exception] {
      mergeRows(src, 3L, (31L, "bad", "-1"))
    }
    assert(messageChain(e2).contains("v_pos"))
  }

  test("SQL surface: faces declare/observe/drop; catalog INSERT and " +
      "UPDATE enforce") {
    val wh = freshRoot("cons_wh")
    spark.conf.set("spark.sql.catalog.gcons", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcons.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcons.db")
    spark.sql("""CREATE TABLE gcons.db.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='2')""")
    spark.sql("INSERT INTO gcons.db.t VALUES (1, 10), (2, 20)")
    val root = s"$wh/db/t"
    val r = spark.sql(
      s"SELECT * FROM graft_add_constraint('$root', 'v_pos', 'v > 0')")
      .head
    assert(r.getString(0) == "v_pos")
    assert(spark.sql(s"SELECT * FROM graft_constraints('$root')")
      .count() == 1)
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcons.db.t VALUES (3, -5)")
    }
    assert(messageChain(e).contains("v_pos"))
    assert(spark.sql("SELECT * FROM gcons.db.t").count() == 2)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE gcons.db.t SET v = -1 WHERE id = 1")
    }
    assert(messageChain(e2).contains("v_pos"))
    assert(spark.sql("SELECT v FROM gcons.db.t WHERE id = 1").head
      .getLong(0) == 10L)
    val d = spark.sql(
      s"SELECT * FROM graft_drop_constraint('$root', 'v_pos')").head
    assert(d.getBoolean(2))
    spark.sql("INSERT INTO gcons.db.t VALUES (3, -5)")
    assert(spark.sql("SELECT * FROM gcons.db.t").count() == 3)
  }

  test("renaming a constrained column refuses loudly: an unresolvable " +
      "check would be silently skipped at the write funnel") {
    val root = freshRoot("cons_rename")
    ManifestTable.create(
      (1L to 10L).map(i => (i, s"d$i", i)).toDF("id", "seg", "v"),
      "id", root, numBuckets = 2)
    ManifestTable.addConstraint(spark, root, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "v", "val2")
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    // unconstrained columns still rename; drop + rename + re-declare
    // is the sanctioned path
    ManifestTable.renameColumn(spark, root, "seg", "segment2")
    ManifestTable.dropConstraint(spark, root, "v_pos")
    ManifestTable.renameColumn(spark, root, "v", "val2")
    ManifestTable.addConstraint(spark, root, "v_pos", "val2 > 0")
    val renamed = StructType(Seq(
      StructField("id", LongType),
      StructField("segment2", StringType),
      StructField("val2", LongType)))
    val e2 = intercept[Exception] {
      mergeRowsTo(root, renamed, 1L, (50L, "x", "-1"))
    }
    assert(messageChain(e2).contains("v_pos"),
      "the re-declared constraint must enforce under the new name")
  }

  private def mergeRowsTo(root: String, sch: StructType, batch: Long,
      rows: (Long, String, String)*): Unit = {
    val m = new graft.mapping.Mapping()
    sch.fieldNames.foreach(n => m.auto(n))
    m.complete(sch)
    val raw = rows.zipWithIndex
      .map { case ((id, sg, vv), i) =>
        (Seq(id.toString, sg, vv), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw), batch, m, root, sch,
      streamId = "cons-spec-r")
  }

  test("DDL surface: CREATE TABLE TBLPROPERTIES constraint.* declares " +
      "before the first row; ALTER SET/UNSET manage the registry") {
    val wh = freshRoot("cons_ddl_wh")
    spark.conf.set("spark.sql.catalog.gcddl", "graft.store.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcddl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcddl.db")
    spark.sql("""CREATE TABLE gcddl.db.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='2',
        'constraint.v_pos'='v > 0')""")
    val root = s"$wh/db/t"
    assert(ManifestTable.constraintsOf(spark, root) ==
      Map("v_pos" -> "v > 0"),
      "CREATE must register the declared constraint")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gcddl.db.t VALUES (1, -1)")
    }
    assert(messageChain(e).contains("v_pos"))
    assert(spark.sql("SELECT * FROM gcddl.db.t").count() == 0)
    spark.sql("INSERT INTO gcddl.db.t VALUES (1, 10)")
    // ALTER SET adds another (validated against current data: a
    // violated one refuses)
    intercept[Exception] {
      spark.sql("ALTER TABLE gcddl.db.t SET TBLPROPERTIES " +
        "('constraint.v_big'='v > 100')")
    }
    spark.sql("ALTER TABLE gcddl.db.t SET TBLPROPERTIES " +
      "('constraint.v_small'='v < 1000')")
    assert(ManifestTable.constraintsOf(spark, root).keySet ==
      Set("v_pos", "v_small"))
    // UNSET drops; the formerly-violating insert passes
    spark.sql("ALTER TABLE gcddl.db.t UNSET TBLPROPERTIES " +
      "('constraint.v_pos')")
    spark.sql("INSERT INTO gcddl.db.t VALUES (2, -7)")
    assert(spark.sql("SELECT * FROM gcddl.db.t").count() == 2)
    assert(ManifestTable.constraintsOf(spark, root).keySet ==
      Set("v_small"))
  }
}
