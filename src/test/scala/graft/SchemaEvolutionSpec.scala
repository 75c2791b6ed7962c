package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable

/** Format-7 manifests record the table schema: self-describing reads
  * (no DDL anywhere), add-only schema evolution on merge, per-version
  * schemas under time travel, and loud refusal of lossy rewrites. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private val widened = StructType(schema.fields :+
    StructField("tier", StringType))

  private def mappingFor(s: StructType) = {
    val m = new Mapping()
    s.fieldNames.foreach(n => m.auto(n))
    m.complete(s)
    m
  }

  private def raw3(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, n, s), i) => (Seq(id.toString, n, s), i.toLong) }
      .toDF("_raw", "_line")

  private def raw4(rows: (Long, String, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, n, s, t), i) =>
        (Seq(id.toString, n, s, t), i.toLong)
      }
      .toDF("_raw", "_line")

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().toSet.map((r: Row) => r.toSeq.toList: Seq[Any])

  test("manifest records the schema; schema-less reads are exact") {
    val root = freshRoot("schema_recorded")
    ManifestTable.merge(mappingFor(schema).project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, mappingFor(schema),
      root, schema, numBuckets = 4)

    assert(ManifestTable.recordedSchema(spark, root).contains(schema))
    assert(ManifestTable.read(spark, root).schema == schema)
    assert(rows(ManifestTable.read(spark, root)) ==
      rows(ManifestTable.read(spark, root, schema)))
    assert(ManifestTable.countRows(spark, root) == 2L)
  }

  test("add-only evolution: new column NULL-fills old rows, upserts work") {
    val root = freshRoot("schema_evolve")
    val m3 = mappingFor(schema)
    ManifestTable.merge(m3.project(
      raw3((1L, "a", "10"), (2L, "b", "20"), (3L, "c", "30"))),
      0L, m3, root, schema, numBuckets = 4)

    // un-opted evolution refuses
    val m4 = mappingFor(widened)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.merge(m4.project(raw4((4L, "d", "40", "gold"))),
        1L, m4, root, widened)
    }
    assert(e.getMessage.contains("evolveSchema"))

    // opted-in: insert with the new column + update an old row
    ManifestTable.merge(m4.project(
      raw4((4L, "d", "40", "gold"), (2L, "B", "21", "silver"))),
      1L, m4, root, widened, evolveSchema = true)

    assert(ManifestTable.recordedSchema(spark, root).contains(widened))
    val got = ManifestTable.read(spark, root)
    assert(got.schema == widened)
    assert(rows(got) == Set(
      Seq(1L, "a", 10L, null),   // untouched old row: NULL-filled
      Seq(2L, "B", 21L, "silver"),
      Seq(3L, "c", 30L, null),
      Seq(4L, "d", 40L, "gold")))

    // time travel shows each version under ITS OWN schema
    assert(ManifestTable.readAt(spark, root, 0L).schema == schema)
    assert(ManifestTable.readAt(spark, root, 1L).schema == widened)
  }

  test("lossy merges refuse: dropped column, re-typed column") {
    val root = freshRoot("schema_lossy")
    val m = mappingFor(widened)
    ManifestTable.merge(m.project(raw4((1L, "a", "10", "gold"))),
      0L, m, root, widened, numBuckets = 4)

    val dropped = intercept[IllegalArgumentException] {
      ManifestTable.merge(mappingFor(schema).project(raw3((2L, "b", "20"))),
        1L, mappingFor(schema), root, schema)
    }
    assert(dropped.getMessage.contains("add-only"))

    val retyped = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("tier", StringType)))
    val mr = new Mapping()
    mr.auto("id"); mr.auto("name"); mr.auto("score"); mr.auto("tier")
    mr.complete(retyped)
    val rawRe = Seq((Seq("2", "b", "20.5", "x"), 0L)).toDF("_raw", "_line")
    val conflict = intercept[IllegalArgumentException] {
      ManifestTable.merge(mr.project(rawRe), 1L, mr, root, retyped)
    }
    assert(conflict.getMessage.contains("re-types"))

    // a stale-schema DELETE (rewrite op) also refuses
    val del = intercept[IllegalArgumentException] {
      ManifestTable.delete(spark, root, schema, "id", Seq(1L), token = 7L)
    }
    assert(del.getMessage.contains("add-only"))
  }

  test("evolution across a delta merge reconciles with NULL-filled base") {
    val root = freshRoot("schema_evolve_delta")
    val m3 = mappingFor(schema)
    ManifestTable.merge(m3.project(raw3((1L, "a", "10"), (2L, "b", "20"))),
      0L, m3, root, schema, numBuckets = 4)
    val m4 = mappingFor(widened)
    ManifestTable.merge(m4.project(raw4((2L, "B", "21", "silver"))),
      1L, m4, root, widened, delta = true, evolveSchema = true)

    assert(rows(ManifestTable.read(spark, root)) == Set(
      Seq(1L, "a", 10L, null),
      Seq(2L, "B", 21L, "silver")))
    // schema-less CDC feed spans the evolution under the widest schema
    val feed = ManifestTable.changes(spark, root, 0L, 1L)
    assert(feed.columns.toSeq ==
      widened.fieldNames.toSeq ++ Seq("_change_type", "_version"))
    assert(rows(feed.filter(col("_change_type") === "update_postimage")
      .drop("_change_type", "_version")) == Set(Seq(2L, "B", 21L, "silver")))
  }

  test("SQL surface works DDL-less on self-describing tables") {
    val root = freshRoot("schema_sql")
    val m = mappingFor(schema)
    ManifestTable.merge(m.project(raw3((1L, "a", "10"), (2L, "b", "20"))),
      0L, m, root, schema, numBuckets = 4)
    ManifestTable.merge(m.project(raw3((2L, "B", "21"))), 1L, m, root, schema)

    GraftExtensions.register(spark)
    val s = spark
    assert(s.sql(s"SELECT * FROM graft_table('$root') ORDER BY id")
      .collect().map(_.toSeq.toList).toSeq ==
      Seq(Seq(1L, "a", 10L), Seq(2L, "B", 21L)))
    assert(s.sql(s"SELECT * FROM graft_table_at('$root', 0) ORDER BY id")
      .collect().map(_.toSeq.toList).toSeq ==
      Seq(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))
    assert(s.sql(s"SELECT n_rows FROM graft_count('$root')")
      .head().getLong(0) == 2L)
    assert(s.sql(
      s"SELECT _change_type, id FROM graft_changes('$root', 0, 1) " +
        "ORDER BY _change_type")
      .collect().map(_.toSeq.toList).toSeq ==
      Seq(Seq("update_postimage", 2L), Seq("update_preimage", 2L)))
  }

  test("randomized evolution sequence tracks a model table") {
    // 6 merges, each randomly (seeded) widening by one column or not,
    // over random key subsets — the committed table must always equal a
    // driver-side model of upsert + add-only evolution. Exercises
    // repeated widening, delta interleaving and NULL-fill layering that
    // the directed tests above pin one step at a time.
    val root = freshRoot("schema_evolve_prop")
    val rnd = new scala.util.Random(42)
    var cols = Vector("id", "name") // grows: c2, c3, ...
    val model = scala.collection.mutable.Map[Long, Map[String, String]]()
    (0 until 6).foreach { step =>
      if (step > 0 && rnd.nextBoolean()) cols :+= s"c$step"
      val sch = StructType(StructField("id", LongType) +:
        cols.drop(1).map(c => StructField(c, StringType)))
      val m = new Mapping()
      cols.foreach(c => m.auto(c))
      m.complete(sch)
      val keys = (1L to 8L).filter(_ => rnd.nextBoolean())
      if (keys.nonEmpty) {
        val rows = keys.map(k =>
          (Seq(k.toString) ++ cols.drop(1).map(c => s"$c-v$step-$k"),
            k)).toDF("_raw", "_line")
        ManifestTable.merge(m.project(rows), step.toLong, m, root, sch,
          numBuckets = 4, delta = step % 2 == 1, evolveSchema = true)
        keys.foreach { k =>
          val prev = model.getOrElse(k, Map.empty)
          model(k) = prev ++
            cols.drop(1).map(c => c -> s"$c-v$step-$k").toMap
        }
      }
    }
    val want = model.map { case (k, vals) =>
      Seq[Any](k) ++ cols.drop(1).map(c => vals.getOrElse(c, null))
    }.toSet
    val got = ManifestTable.read(spark, root)
    assert(got.schema.fieldNames.toSeq == cols)
    assert(rows(got) == want.map(_.toList: Seq[Any]))
  }

  test("CDC stream infers its schema from the manifest") {
    val root = freshRoot("schema_cdc_infer")
    val ckpt = freshRoot("schema_cdc_infer_ckpt")
    val m = mappingFor(schema)
    ManifestTable.merge(m.project(raw3((1L, "a", "10"))), 0L, m, root,
      schema, numBuckets = 4)

    val stream = graft.streaming.CdcSource.readStream(spark, root,
      Map("startingVersion" -> "earliest"))
    assert(stream.schema.fieldNames.toSeq ==
      schema.fieldNames.toSeq ++ Seq("_change_type", "_version"))
    val got = scala.collection.mutable.ArrayBuffer[Row]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        got.synchronized { got ++= df.collect() }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(got.map(_.toSeq.toList).toSet ==
      Set(Seq(1L, "a", 10L, "insert", 0L)))
  }

  // ------------------------------------------------ column mapping

  private val renamed = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("points", LongType)))

  test("rename is metadata-only: reads translate, merges after the " +
      "rename write the stable physical name, compaction keeps values") {
    val root = freshRoot("schema_rename")
    val m = mappingFor(schema)
    ManifestTable.merge(m.project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, m,
      root, schema, numBuckets = 4, streamId = "S")
    val v0 = ManifestTable.currentVersion(spark, root).get
    val filesBefore = ManifestTable.currentManifest(spark, root)
      .get.entries.map(_.relPath).toSet

    ManifestTable.renameColumn(spark, root, "score", "points")

    // metadata-only: not a single data file moved
    assert(ManifestTable.currentManifest(spark, root)
      .get.entries.map(_.relPath).toSet == filesBefore)
    assert(ManifestTable.recordedSchema(spark, root).contains(renamed))
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))

    // a merge under the NEW name updates + inserts; on disk the column
    // keeps its physical name, so old and new files stay compatible
    val m2 = mappingFor(renamed)
    ManifestTable.merge(m2.project(
      raw3((2L, "b", "21"), (3L, "c", "30"))), 1L, m2,
      root, renamed, streamId = "S")
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a", 10L), Seq(2L, "b", 21L), Seq(3L, "c", 30L)))
    val phys = spark.read.parquet(
      s"$root/${ManifestTable.currentManifest(spark, root)
        .get.entries.maxBy(_.seq).relPath}")
    assert(phys.schema.fieldNames.contains("score") &&
      !phys.schema.fieldNames.contains("points"),
      s"files must keep the physical name, got ${phys.schema}")

    // time travel: each version under its OWN names
    assert(ManifestTable.readAt(spark, root, v0).schema
      .fieldNames.toSeq == Seq("id", "name", "score"))
    assert(rows(ManifestTable.readAt(spark, root, v0)) ==
      Set(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))

    // delta merge + compact after the rename keep values exact
    ManifestTable.merge(m2.project(raw3((1L, "a", "11"))), 2L, m2,
      root, renamed, streamId = "S", delta = true)
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a", 11L), Seq(2L, "b", 21L), Seq(3L, "c", 30L)))
    ManifestTable.compact(spark, root, renamed, "id", token = 99L)
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a", 11L), Seq(2L, "b", 21L), Seq(3L, "c", 30L)))
  }

  test("key column rename: lookups, pruning metadata and a recorded " +
      "comparator keyExpr all follow the new name") {
    val root = freshRoot("schema_rename_key")
    val strSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    val m = new Mapping("k") {
      override def keyComparator = c => trim(lower(c))
    }
    m.auto("k", c => c); m.auto("v")
    m.complete(strSchema)
    ManifestTable.merge(
      m.project(graft.sources.Sources.rows(spark,
        Seq(Seq("ABC", "x"), Seq("DEF", "y")), headerLines = -1)),
      0L, m, root, strSchema, numBuckets = 2, streamId = "A")

    ManifestTable.renameColumn(spark, root, "k", "doc_key")
    val mf = ManifestTable.currentManifest(spark, root).get
    assert(mf.keyColumn == "doc_key")
    assert(mf.keyExpr.contains("doc_key") && !mf.keyExpr.contains("`k`"),
      s"keyExpr must be rewritten to the new name, got '${mf.keyExpr}'")

    val renamedStr = StructType(Seq(
      StructField("doc_key", StringType), StructField("v", StringType)))
    // normalized lookup probes by the new name
    assert(ManifestTable.lookup(spark, root, renamedStr, "doc_key",
      Seq(" abc "), keyComparator = c => trim(lower(c)))
      .collect().map(_.getString(1)).toSeq == Seq("x"))
    // a delta merge under the new key name reconciles normalized
    val m2 = new Mapping("doc_key") {
      override def keyComparator = c => trim(lower(c))
    }
    m2.auto("doc_key", c => c); m2.auto("v")
    m2.complete(renamedStr)
    ManifestTable.merge(
      m2.project(graft.sources.Sources.rows(spark,
        Seq(Seq("  abc ", "x2")), headerLines = -1)),
      1L, m2, root, renamedStr, streamId = "A", delta = true)
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq("  abc ", "x2"), Seq("DEF", "y")))
  }

  test("rename refusals: unknown/duplicate names, and a new column " +
      "colliding with a renamed column's physical storage name") {
    val root = freshRoot("schema_rename_refuse")
    val m = mappingFor(schema)
    ManifestTable.merge(m.project(raw3((1L, "a", "10"))), 0L, m,
      root, schema, numBuckets = 2)
    ManifestTable.renameColumn(spark, root, "score", "points")

    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "score", "x") // gone
    }
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(spark, root, "name", "points") // taken
    }
    // adding a column named like the renamed column's PHYSICAL name
    // would leak the old values out of existing files — refused
    val e = intercept[IllegalArgumentException] {
      ManifestTable.evolveSchema(spark, root,
        StructType(renamed.fields :+ StructField("score", LongType)))
    }
    assert(e.getMessage.contains("PHYSICAL storage name"))
    // a different new name evolves fine; old rows read it as NULL
    ManifestTable.evolveSchema(spark, root,
      StructType(renamed.fields :+ StructField("extra", LongType)))
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a", 10L, null)))
    // rename BACK to the original name drops the mapping to identity
    ManifestTable.renameColumn(spark, root, "points", "score")
    assert(ManifestTable.currentManifest(spark, root).get.colMap.isEmpty)
    assert(rows(ManifestTable.read(spark, root)
      .select("id", "score")) == Set(Seq(1L, 10L)))
  }

  test("CDC across a rename: the feed speaks the TO-version's names " +
      "for commits on either side of the rename") {
    val root = freshRoot("schema_rename_cdc")
    val m = mappingFor(schema)
    ManifestTable.merge(m.project(raw3((1L, "a", "10"))), 0L, m,
      root, schema, numBuckets = 2, streamId = "S")
    ManifestTable.merge(m.project(raw3((2L, "b", "20"))), 1L, m,
      root, schema, streamId = "S")
    ManifestTable.renameColumn(spark, root, "score", "points")
    val m2 = mappingFor(renamed)
    ManifestTable.merge(m2.project(raw3((1L, "a", "11"))), 2L, m2,
      root, renamed, streamId = "S")
    // range spans: pre-rename data commit (v1), the rename (v2,
    // metadata-only: empty diff), post-rename data commit (v3)
    val feed = ManifestTable.changes(spark, root, 0L, 3L)
    assert(feed.schema.fieldNames.take(3).toSeq ==
      Seq("id", "name", "points"))
    val got = feed.collect().map(_.toSeq.toList).toSet
    assert(got == Set(
      Seq(2L, "b", 20L, "insert", 1L),
      Seq(1L, "a", 10L, "update_preimage", 3L),
      Seq(1L, "a", 11L, "update_postimage", 3L)), s"got $got")
  }
}
