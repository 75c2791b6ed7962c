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

  // ---- DROP COLUMN (r14): metadata-only, physical name stays claimed

  private val narrowed = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("dropColumn is metadata-only: reads narrow exactly, files " +
      "stay put, later rewrites shed the column physically") {
    val root = freshRoot("drop_basic")
    ManifestTable.merge(mappingFor(schema).project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, mappingFor(schema),
      root, schema, numBuckets = 4)
    val m0 = ManifestTable.currentManifest(spark, root).get
    ManifestTable.dropColumn(spark, root, "score")
    val m1 = ManifestTable.currentManifest(spark, root).get
    assert(m1.version == m0.version + 1)
    assert(m1.entries == m0.entries, "drop must move no data file")
    assert(ManifestTable.recordedSchema(spark, root).get
      .fieldNames.toSeq == Seq("id", "name"))
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a"), Seq(2L, "b")))
    // a post-drop merge writes files WITHOUT the column and upserts fine
    val mN = {
      val m = new Mapping()
      Seq("id", "name").foreach(m.auto(_))
      m.complete(narrowed)
      m
    }
    val raw2 = Seq((Seq("1", "a2"), 0L), (Seq("3", "c"), 1L))
      .toDF("_raw", "_line")
    ManifestTable.merge(mN.project(raw2), 1L, mN, root, narrowed)
    assert(rows(ManifestTable.read(spark, root)) ==
      Set(Seq(1L, "a2"), Seq(2L, "b"), Seq(3L, "c")))
    val newFiles = ManifestTable.currentManifest(spark, root).get
      .entries.filterNot(m0.entries.contains)
    assert(newFiles.nonEmpty)
    newFiles.foreach { e =>
      val s = spark.read.parquet(s"$root/${e.relPath}").schema
      assert(!s.fieldNames.contains("score"),
        s"post-drop rewrite must shed the column: ${e.relPath} has $s")
    }
  }

  test("the dropped column's physical name stays claimed: re-ADD " +
      "refuses; ADD-then-RENAME onto the name is safe and leaks nothing") {
    val root = freshRoot("drop_claim")
    ManifestTable.merge(mappingFor(schema).project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, mappingFor(schema),
      root, schema, numBuckets = 4)
    ManifestTable.dropColumn(spark, root, "score")
    // re-adding 'score' would read the OLD files' values into the new
    // column on mixed reads — refused at the evolution funnel
    val e = intercept[IllegalArgumentException] {
      ManifestTable.evolveSchema(spark, root, schema)
    }
    assert(e.getMessage.contains("dropped"), e.getMessage)
    // the documented path: add under a fresh name, then rename onto
    // 'score' — the rename carries its own physical name, so the old
    // bytes stay invisible
    val withFresh = StructType(narrowed.fields :+
      StructField("score2", LongType))
    ManifestTable.evolveSchema(spark, root, withFresh)
    ManifestTable.renameColumn(spark, root, "score2", "score")
    val got = ManifestTable.read(spark, root).orderBy("id").collect()
      .map(r => (r.getLong(0), r.isNullAt(2))).toSeq
    assert(got == Seq((1L, true), (2L, true)),
      s"old rows must read the re-added column as NULL, never the " +
        s"dropped values: $got")
  }

  test("drop survives time travel, CDC and clone; refusals: key, " +
      "cluster, constraint-referenced") {
    val root = freshRoot("drop_travel")
    ManifestTable.merge(mappingFor(schema).project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, mappingFor(schema),
      root, schema, numBuckets = 4)
    ManifestTable.dropColumn(spark, root, "score") // v1
    val mN = {
      val m = new Mapping()
      Seq("id", "name").foreach(m.auto(_))
      m.complete(narrowed)
      m
    }
    ManifestTable.merge(mN.project(
      Seq((Seq("3", "c"), 0L)).toDF("_raw", "_line")), 1L, mN, root,
      narrowed) // v2
    // TIME TRAVEL: the pre-drop version reads under ITS schema
    val v0 = ManifestTable.readAt(spark, root, 0L)
    assert(v0.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(rows(v0) == Set(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))
    // CDC across the drop speaks the TO-version's (narrowed) schema
    val feed = ManifestTable.changes(spark, root, 0L, 2L)
    assert(feed.schema.fieldNames.take(2).toSeq == Seq("id", "name"))
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet == Set(3L))
    // CLONE carries the narrowed schema AND the physical-name claim
    val dst = freshRoot("drop_travel_clone")
    ManifestTable.cloneAt(spark, root, dst)
    assert(ManifestTable.recordedSchema(spark, dst).get
      .fieldNames.toSeq == Seq("id", "name"))
    val ec = intercept[IllegalArgumentException] {
      ManifestTable.evolveSchema(spark, dst, schema)
    }
    assert(ec.getMessage.contains("dropped"))
    // refusals
    assert(intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "id")
    }.getMessage.contains("key column"))
    ManifestTable.addConstraint(spark, root, "name_nn",
      "name IS NOT NULL")
    assert(intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, root, "name")
    }.getMessage.contains("name_nn"))
    val rootC = freshRoot("drop_cluster")
    ManifestTable.merge(mappingFor(schema).project(
      raw3((1L, "a", "10"), (2L, "b", "20"))), 0L, mappingFor(schema),
      rootC, schema, numBuckets = 2)
    ManifestTable.clusterBy(spark, rootC, schema, "id", "score",
      token = 9L)
    assert(intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, rootC, "score")
    }.getMessage.contains("cluster column"))
  }

  // ---- TYPE WIDENING (r14): metadata-only, old files read back wide

  test("widenColumn: int->long, float->double, decimal precision-up " +
      "read mixed narrow/wide files exactly; refusals are loud") {
    val root = freshRoot("widen_basic")
    val s0 = StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType),
      StructField("f", FloatType), StructField("d", DecimalType(5, 2))))
    val df0 = Seq(
      (1L, 7, 1.5f, BigDecimal("123.45")),
      (2L, Int.MaxValue, -0.0f, BigDecimal("999.99")))
      .toDF("id", "n", "f", "d")
      .select(col("id"), col("n"), col("f"),
        col("d").cast(DecimalType(5, 2)).as("d"))
    ManifestTable.create(df0, "id", root, numBuckets = 2)
    ManifestTable.widenColumn(spark, root, "n", LongType)
    ManifestTable.widenColumn(spark, root, "f", DoubleType)
    ManifestTable.widenColumn(spark, root, "d", DecimalType(12, 2))
    val s1 = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType),
      StructField("f", DoubleType),
      StructField("d", DecimalType(12, 2))))
    assert(ManifestTable.recordedSchema(spark, root).get.fields
      .map(f => (f.name, f.dataType)).toSeq ==
      s1.fields.map(f => (f.name, f.dataType)).toSeq)
    // old (narrow-file) rows read back EXACT under the wide schema
    val before = ManifestTable.read(spark, root).orderBy("id").collect()
    assert(before(0).getLong(1) == 7L &&
      before(0).getDouble(2) == 1.5d &&
      before(0).getDecimal(3) == new java.math.BigDecimal("123.45"))
    assert(before(1).getLong(1) == Int.MaxValue.toLong)
    // new writes land WIDE: values beyond the old type's range work,
    // and the mixed-file read stays exact
    val mW = {
      val m = new Mapping()
      Seq("id", "n", "f", "d").foreach(m.auto(_))
      m.complete(s1)
      m
    }
    val big = Seq((Seq("3", (Long.MaxValue - 1).toString, "2.25",
      "9876543210.12"), 0L)).toDF("_raw", "_line")
    ManifestTable.merge(mW.project(big), 1L, mW, root, s1)
    val after = ManifestTable.read(spark, root).orderBy("id").collect()
    assert(after.length == 3 &&
      after(2).getLong(1) == Long.MaxValue - 1 &&
      after(2).getDecimal(3) ==
        new java.math.BigDecimal("9876543210.12"))
    // a stale NARROW-schema writer refuses loudly (the write-funnel
    // cast check): widening is per-writer opt-in, never a silent cast
    val stale = intercept[IllegalArgumentException] {
      ManifestTable.merge(mappingFor(s0).project(
        Seq((Seq("4", "1", "1.0", "1.00"), 0L)).toDF("_raw", "_line")),
        2L, mappingFor(s0), root, s0)
    }
    assert(stale.getMessage.contains("re-types"))
    // refusals: narrowing, scale change, key column, bloom-covered
    assert(intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, root, "n", IntegerType)
    }.getMessage.contains("not a safe widening"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, root, "d", DecimalType(14, 4))
    }.getMessage.contains("not a safe widening"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, root, "id", LongType) // no-op ok
      ManifestTable.widenColumn(spark, root, "id", DecimalType(20, 0))
    }.getMessage.contains("not a safe widening"))
    val rootB = freshRoot("widen_bloom")
    val sB = StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType)))
    ManifestTable.create(
      Seq((1L, 5), (2L, 6)).toDF("id", "n"), "id", rootB,
      numBuckets = 2)
    graft.store.BloomSkip.buildBlooms(spark, rootB, sB, Seq("n"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, rootB, "n", LongType)
    }.getMessage.contains("bloom"),
      "bloom filters hash the native type — widening under them must " +
        "refuse")
    // zones are domain-stable (ints render through long, floats
    // through double): widening under a ZONE sidecar keeps the pruned
    // lookup exact — pre-widen zone rows answer post-widen probes
    val rootZ = freshRoot("widen_zone")
    ManifestTable.create(
      Seq((1L, 5), (2L, 600)).toDF("id", "n"), "id", rootZ,
      numBuckets = 2)
    graft.store.ZoneSkip.buildZones(spark, rootZ, sB, Seq("n"))
    ManifestTable.widenColumn(spark, rootZ, "n", LongType)
    GraftExtensions.register(spark)
    val zoneRead = spark.sql(s"SELECT * FROM graft_zone_lookup(" +
      s"'$rootZ', 'id BIGINT, n BIGINT', 'n', 500, 700)").collect()
    assert(zoneRead.length == 1 && zoneRead.head.getLong(0) == 2L &&
      zoneRead.head.getLong(1) == 600L,
      s"pre-widen zone rows must answer post-widen probes: " +
        zoneRead.mkString(","))
  }

  test("widening the KEY column refuses: bucket addressing hashes the " +
      "native type") {
    val root = freshRoot("widen_key")
    ManifestTable.create(
      Seq((1, "a"), (2, "b")).toDF("k", "v"), "k", root, numBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.widenColumn(spark, root, "k", LongType)
    }
    assert(e.getMessage.contains("key column"))
  }
}
