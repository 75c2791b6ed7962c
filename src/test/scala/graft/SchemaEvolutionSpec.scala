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
}
