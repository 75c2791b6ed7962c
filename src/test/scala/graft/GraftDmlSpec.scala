package graft

import graft.store.ManifestTable

/** SQL `UPDATE` / `MERGE INTO` on catalog tables: the GraftDmlStrategy
  * planning seam mapping both statements onto the manifest table's own
  * key-matched merge primitives. Values, clause ordering, bucket
  * locality (the 100 TB property: a key-scoped statement rewrites only
  * the key's bucket), and the refusals that protect the keyed-table
  * invariant. */
class GraftDmlSpec extends SparkSpec {

  GraftExtensions.register(spark)

  private val wh = "target/test-tmp/graft_dml_wh"
  org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  spark.conf.set("spark.sql.catalog.dmlcat", "graft.store.GraftCatalog")
  spark.conf.set("spark.sql.catalog.dmlcat.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS dmlcat.db")

  private var nextId = 0
  private def freshTable(rows: String = ""): String = {
    nextId += 1
    val t = s"dmlcat.db.t$nextId"
    spark.sql(s"""CREATE TABLE $t (id BIGINT, name STRING, v DOUBLE)
      USING graft TBLPROPERTIES ('key'='id', 'numBuckets'='4')""")
    if (rows.nonEmpty) spark.sql(s"INSERT INTO $t VALUES $rows")
    t
  }

  private def state(t: String): Seq[String] =
    spark.sql(s"SELECT id, name, v FROM $t ORDER BY id")
      .collect().map(_.mkString("|")).toSeq

  private def rootOf(t: String): String =
    s"$wh/db/${t.split('.').last}"

  test("UPDATE: conditional and unconditional, expressions over the " +
      "old row, one commit per statement") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    val v0 = ManifestTable.currentVersion(spark, rootOf(t)).get
    spark.sql(s"UPDATE $t SET v = v + 10, name = upper(name) WHERE id = 2")
    assert(state(t) == Seq("1|a|1.0", "2|B|12.0", "3|c|3.0"))
    assert(ManifestTable.currentVersion(spark, rootOf(t)).get == v0 + 1)
    spark.sql(s"UPDATE $t SET v = -v") // no WHERE: full-table rewrite
    assert(state(t) == Seq("1|a|-1.0", "2|B|-12.0", "3|c|-3.0"))
    assert(ManifestTable.currentVersion(spark, rootOf(t)).get == v0 + 2)
  }

  test("UPDATE with a zoned range WHERE: zone-hinted read, exact result") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    val root = rootOf(t)
    spark.sql(s"INSERT INTO $t " +
      "SELECT id, concat('n', id), CAST(id AS DOUBLE) FROM range(1, 501)")
    val s = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    graft.store.ManifestTable.clusterBy(spark, root, s, "id", "v",
      token = 99L, filesPerBucket = 8)
    graft.store.ZoneSkip.buildZones(spark, root, s, Seq("v"))
    // range WHERE over the clustered column: runUpdate derives the zone
    // hint from the conjuncts; result must equal the predicate exactly
    spark.sql(s"UPDATE $t SET name = 'hit' " +
      "WHERE v >= 100 AND v <= 120 AND name LIKE 'n%'")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE name = 'hit'")
      .head.getLong(0) == 21L)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 500L)
    assert(spark.sql(
        s"SELECT count(*) FROM $t WHERE name = 'hit' AND (v < 100 OR v > 120)")
      .head.getLong(0) == 0L)
  }

  test("UPDATE with an equality WHERE over a bloomed column: " +
      "bloom-hinted read, exact result") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    val root = rootOf(t)
    spark.sql(s"INSERT INTO $t SELECT id, concat('dom', id % 100), " +
      "CAST(id AS DOUBLE) FROM range(1, 1001)")
    val s = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    graft.store.BloomSkip.buildBlooms(spark, root, s, Seq("name"))
    spark.sql(s"UPDATE $t SET v = -1 WHERE name = 'dom7'")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v = -1")
      .head.getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE name = 'dom7' " +
      "AND v <> -1").head.getLong(0) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) == 1000L)
  }

  test("UPDATE by key rewrites ONLY the key's bucket") {
    val t = freshTable((1L to 40L).map(i => s"($i,'n$i',$i.0)")
      .mkString(","))
    val root = rootOf(t)
    val before = ManifestTable.currentManifest(spark, root).get
    spark.sql(s"UPDATE $t SET v = 0 WHERE id = 17")
    val after = ManifestTable.currentManifest(spark, root).get
    val rewritten = after.entries.filter(_.seq == after.version)
    assert(rewritten.map(_.bucket).distinct.size == 1,
      s"expected one rewritten bucket, got $rewritten")
    // the other buckets' files are byte-identical carryovers
    val carried = after.entries.filterNot(_.seq == after.version)
    assert(carried.toSet.subsetOf(before.entries.toSet))
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 17")
      .collect().head.getDouble(0) == 0.0)
  }

  test("MERGE INTO: clause order, conditions over both sides, " +
      "delete/update/insert in ONE commit") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0),(3,'c',3.0),(4,'d',-4.0)")
    val v0 = ManifestTable.currentVersion(spark, rootOf(t)).get
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (2,'B',20.0),(3,'C',30.0),(4,'D',40.0),
          (9,'i',9.0) AS s(id, name, v)) s
      ON t.id = s.id
      WHEN MATCHED AND t.v < 0 THEN DELETE
      WHEN MATCHED AND s.id = 3 THEN UPDATE SET v = s.v + t.v
      WHEN MATCHED THEN UPDATE SET name = s.name
      WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""")
    // 1 untouched; 2 hits the third clause (name only); 3 hits the
    // second (v only); 4 (negative) deleted; 9 inserted
    assert(state(t) == Seq("1|a|1.0", "2|B|2.0", "3|c|33.0", "9|i|9.0"))
    assert(ManifestTable.currentVersion(spark, rootOf(t)).get == v0 + 1)
  }

  test("MERGE INTO: matched row with no applicable clause keeps; " +
      "unmatched source row with no applicable INSERT drops") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0)")
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (2,'B',-1.0),(7,'x',-7.0) AS s(id,name,v)) s
      ON t.id = s.id
      WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v
      WHEN NOT MATCHED AND s.v > 0 THEN INSERT *""")
    assert(state(t) == Seq("1|a|1.0", "2|b|2.0"))
  }

  test("MERGE INTO: WHEN NOT MATCHED BY SOURCE update and delete") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"""MERGE INTO $t t USING (SELECT 2 AS id) s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id = 1 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'stale'""")
    assert(state(t) == Seq("2|b|2.0", "3|stale|3.0"))
  }

  test("MERGE INTO an empty table: pure inserts; INSERT with explicit " +
      "column list fills unassigned columns with NULL") {
    val t = freshTable()
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (1,'a'),(2,'b') AS s(id, name)) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, name) VALUES (s.id, s.name)""")
    assert(state(t) == Seq("1|a|null", "2|b|null"))
  }

  test("MERGE INTO: null source keys are dropped, not inserted") {
    val t = freshTable("(1,'a',1.0)")
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (CAST(NULL AS BIGINT),'n',0.0),(2,'b',2.0)
          AS s(id, name, v)) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    assert(state(t) == Seq("1|a|1.0", "2|b|2.0"))
  }

  test("MERGE INTO by key touches ONLY the source keys' buckets") {
    val t = freshTable((1L to 40L).map(i => s"($i,'n$i',$i.0)")
      .mkString(","))
    val root = rootOf(t)
    val before = ManifestTable.currentManifest(spark, root).get
    spark.sql(s"""MERGE INTO $t t USING (SELECT 17 AS id, 'X' AS name,
        0.0 AS v) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET name = s.name""")
    val after = ManifestTable.currentManifest(spark, root).get
    assert(after.entries.filter(_.seq == after.version)
      .map(_.bucket).distinct.size == 1)
    assert(after.entries.filterNot(_.seq == after.version).toSet
      .subsetOf(before.entries.toSet))
  }

  test("refusals: key reassignment, extra ON conjuncts, duplicate " +
      "source keys, re-keying INSERT, time travel, schema evolution") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0)")
    def failing(sql: String): String =
      intercept[Exception](spark.sql(sql)).getMessage
    assert(failing(s"UPDATE $t SET id = 99 WHERE id = 1")
      .contains("key column"))
    assert(failing(s"""MERGE INTO $t t USING (SELECT 1 AS id, 'x' AS name,
        0.0 AS v) s
      ON t.id = s.id AND t.v > 0
      WHEN MATCHED THEN DELETE""").contains("key equality only"))
    assert(failing(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (5,'x',0.0),(5,'y',1.0) AS s(id,name,v)) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""").contains("unique"))
    assert(failing(s"""MERGE INTO $t t USING (SELECT 5 AS id, 'x' AS name,
        0.0 AS v) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, name, v)
        VALUES (s.id + 1, s.name, s.v)""").contains("ON key"))
    assert(failing(s"""MERGE INTO $t t USING (SELECT 1 AS id, 'x' AS name,
        0.0 AS v) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET id = s.id + 1""")
      .contains("key column"))
    // UPDATE on a time-travelled snapshot: Spark's parser refuses the
    // temporal spec on a DML target outright
    assert(intercept[Exception](spark.sql(
      s"UPDATE $t VERSION AS OF 0 SET v = 0")) != null)
    // MERGE WITH SCHEMA EVOLUTION: the ANALYZER consumes the flag —
    // for a table without evolution capability it aligns the actions
    // to the existing schema (the extra column is dropped from the
    // resolved INSERT), so the statement executes as a plain merge
    // and the schema stays put; the strategy's own refusal remains as
    // a guard should a live flag ever reach it
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $t t
      USING (SELECT 8 AS id, 'x' AS name, 0.0 AS v, 1 AS extra) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table(t).schema.fieldNames.toSeq ==
      Seq("id", "name", "v"))
    assert(state(t).contains("8|x|0.0"))
  }

  test("SQL DELETE under spark.graft.delete.tombstone: key statements " +
      "write tombstones instead of rewriting buckets") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0),(3,'c',3.0),(4,'d',4.0)")
    val root = rootOf(t)
    val m0 = ManifestTable.currentManifest(spark, root).get
    spark.conf.set("spark.graft.delete.tombstone", "true")
    try {
      spark.sql(s"DELETE FROM $t WHERE id IN (2, 4)")
      val m1 = ManifestTable.currentManifest(spark, root).get
      assert(m1.entries.exists(_.tomb),
        "conf-enabled SQL DELETE must write tombstones")
      m0.entries.foreach(e => assert(m1.entries.contains(e),
        s"tombstoned SQL DELETE must keep prior files live: $e"))
      assert(state(t) == Seq("1|a|1.0", "3|c|3.0"))
    } finally spark.conf.unset("spark.graft.delete.tombstone")
    // conf off: the next key DELETE takes the rewrite path again — no
    // new tombstone appears (the touched bucket's rewrite may even
    // fold existing ones away)
    val tombsBefore = ManifestTable.currentManifest(spark, root).get
      .entries.count(_.tomb)
    spark.sql(s"DELETE FROM $t WHERE id = 3")
    val m2 = ManifestTable.currentManifest(spark, root).get
    assert(state(t) == Seq("1|a|1.0"))
    assert(m2.entries.count(_.tomb) <= tombsBefore,
      "conf-off SQL DELETE must not write tombstones")
  }

  test("UPDATE values survive a concurrent-ish sequence: update, merge, " +
      "delete, read back consistent") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"UPDATE $t SET v = v * 10 WHERE id >= 2")
    spark.sql(s"""MERGE INTO $t t USING (SELECT 3 AS id, 0.0 AS v) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(state(t) == Seq("2|b|20.0", "3|c|0.0"))
  }

  test("MERGE INTO: UPDATE SET * / INSERT * — the star forms expand to " +
      "a key assignment equal to the ON key, which is the allowed " +
      "identity; a REAL re-key still refuses") {
    val t = freshTable("(1,'a',1.0),(2,'b',2.0)")
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (1L, 'A', 10.0), (9L, 'z', 90.0)
        AS s(id, name, v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(state(t) == Seq("1|A|10.0", "2|b|2.0", "9|z|90.0"),
      "UPDATE SET * is the most common MERGE form and must work")
    // explicit identity key assignment is equally fine
    spark.sql(s"""MERGE INTO $t t USING (
        SELECT * FROM VALUES (2L, 'B', 20.0) AS s(id, name, v)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET id = s.id, v = s.v""")
    assert(state(t) == Seq("1|A|10.0", "2|b|20.0", "9|z|90.0"))
    // a real re-key (key := something other than the ON key) refuses
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $t t USING (
          SELECT * FROM VALUES (2L, 'B', 20.0) AS s(id, name, v)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET id = s.id + 1""")
    }
    assert(e.getMessage.contains("key column"), e.getMessage)
  }
}
