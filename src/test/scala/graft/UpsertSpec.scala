package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping._
import graft.operators._
import graft.sources.Sources

/** Mirrors reference tests/importtask_test.py `test_nominal` end-to-end:
  * two ordered sources folded into one target, with history capture.
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val targetSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("col1", StringType,
      metadata = new MetadataBuilder().putLong("maxlength", 1).build()),
    StructField("col2", StringType),
    StructField("col3", StringType),
    StructField("col4", StringType),
    StructField("col5", LongType),
    StructField("col6", LongType)))

  private def target: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "", "", "C", "D", null, 1L),
      Row(2L, "E", "F", "G", "H", 2L, 1L)),
    targetSchema)

  private def mappingA = {
    val m = new Mapping()
    m.auto("id")
    m.auto("col1", opts = ColOpts(keepHistory = true))
    m.auto("col2", opts = ColOpts(shouldUpdate = false))
    m.auto("col3")
    m.auto("col4")
    m.auto("col5", opts = ColOpts(warnOnError = false))
    m
  }

  private def mappingB = {
    val m = new Mapping()
    m.auto("id", opts = ColOpts(shouldUpdate = false))
    m.auto("col6", opts = ColOpts(shouldUpdateOnlyIfNull = true))
    m
  }

  private def source1 = Sources.rows(spark, Seq(
    Seq("0", "0", "0", "0", "0", "0"), // header (skipped, headerLines=0)
    Seq("1", "ABCDEFG", "B", "C", "D", "1"),
    Seq("2", "E", "F", "G", "H", "2"),
    Seq("3", "I", "J", "K", "L", "a"),
    Seq("", "I", "J", "K", "L", "3")))

  private def source2 = Sources.rows(spark, Seq(
    Seq("1", "2"),
    Seq("2", "2"),
    Seq("3", "2"),
    Seq("5", "")), headerLines = -1)

  test("nominal two-source import (test_nominal)") {
    val res = ImportPipeline.run(
      target,
      Seq(
        ImportPipeline.SourceDef(source1, mappingA),
        ImportPipeline.SourceDef(source2, mappingB, Update)),
      nonNullable = Seq("col1"))

    val merged = res.merged.orderBy("id").collect().toSeq
    assert(merged == Seq(
      // col1 truncated+updated, col2 frozen (should_update=false),
      // col5 parsed+updated, col6 kept (non-null)
      Row(1L, "A", "", "C", "D", 1L, 1L),
      // untouched (all values identical)
      Row(2L, "E", "F", "G", "H", 2L, 1L),
      // created by source1 (col5 invalid → null), col6 filled by source2
      Row(3L, "I", "J", "K", "L", null, 2L)))

    // History: source1 tracked col1 change on id=1 (old "" → new "A").
    val h1 = res.histories.head.collect().toSeq
    assert(h1 == Seq(Row(1L, "", "A")))
    assert(res.histories.head.columns.toSeq
      == Seq("id", "old_col1", "new_col1"))
    // Source2 has no keep_history columns.
    assert(res.histories(1).isEmpty)

    // Stats, source1: 3 read keys, 1 created (id=3), 1 updated (id=1),
    // 1 missing id.
    val s1 = res.stats.head.collect().head
    assert(s1.getAs[Long]("read_keys") == 3L)
    assert(s1.getAs[Long]("created") == 1L)
    assert(s1.getAs[Long]("updated") == 1L)
    assert(s1.getAs[Long]("ignored_missing_id") == 1L)
    assert(s1.getAs[Long]("rejected") == 0L)
    assert(s1.getAs[Long]("not_found") == 0L)

    // Stats, source2 (UPDATE mode): id=5 not creatable; id=3 col6 filled.
    val s2 = res.stats(1).collect().head
    assert(s2.getAs[Long]("read_keys") == 4L)
    assert(s2.getAs[Long]("created") == 0L)
    assert(s2.getAs[Long]("updated") == 1L)
    assert(s2.getAs[Long]("ignored_not_created") == 1L)
  }

  test("incremental commit on the manifest format matches test_nominal") {
    val root = "target/test-tmp/upsert_manifest"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // bootstrap the table from the existing target, then fold both
    // sources through incremental merges (only touched buckets rewrite)
    graft.store.ManifestTable.create(target, "id", root, numBuckets = 4)
    ImportPipeline.commitIncremental(
      spark, root, targetSchema,
      Seq(
        ImportPipeline.SourceDef(source1, mappingA),
        ImportPipeline.SourceDef(source2, mappingB, Update)),
      nonNullable = Seq("col1"))
    val merged = graft.store.ManifestTable.read(spark, root, targetSchema)
      .orderBy("id").collect().toSeq
    assert(merged == Seq(
      Row(1L, "A", "", "C", "D", 1L, 1L),
      Row(2L, "E", "F", "G", "H", 2L, 1L),
      Row(3L, "I", "J", "K", "L", null, 2L)))
    // two merges on top of the bootstrap version
    assert(graft.store.ManifestTable.currentVersion(spark, root)
      .contains(2L))
  }

  test("create-only mode ignores matched rows") {
    val m = mappingA
    val projected = m.complete(targetSchema).project(source1)
    val res = Upsert(target, projected, m, Create)
    val merged = res.merged.orderBy("id").collect().toSeq
    // id=1 untouched (no update), id=3 created
    assert(merged.head == Row(1L, "", "", "C", "D", null, 1L))
    assert(merged(2) == Row(3L, "I", "J", "K", "L", null, null))
    val s = res.stats.collect().head
    assert(s.getAs[Long]("ignored_not_updated") == 2L)
    assert(s.getAs[Long]("created") == 1L)
  }

  test("last duplicate wins within a source (importtask.py:262-277)") {
    val m = mappingA
    val dupSource = Sources.rows(spark, Seq(
      Seq("1", "X", "B", "C", "D", "7"),
      Seq("1", "Y", "B", "C", "D", "8")), headerLines = -1)
    val projected = m.complete(targetSchema).project(dupSource)
    val res = Upsert(target, projected, m)
    val r = res.merged.filter($"id" === 1).head
    assert(r.getString(1) == "Y" && r.getLong(5) == 8L)
  }

  test("duplicate restoring stored value cancels the update") {
    val m = mappingA
    // Second row restores col1/col5 to the stored values of id=2 → final
    // state unchanged, updated count 0.
    val dupSource = Sources.rows(spark, Seq(
      Seq("2", "X", "F", "G", "H", "9"),
      Seq("2", "E", "F", "G", "H", "2")), headerLines = -1)
    val projected = m.complete(targetSchema).project(dupSource)
    val res = Upsert(target, projected, m)
    assert(res.merged.filter($"id" === 2).head
      == Row(2L, "E", "F", "G", "H", 2L, 1L))
    assert(res.stats.collect().head.getAs[Long]("updated") == 0L)
  }

  test("non-nullable rejection reverts updates and drops creates") {
    val m = mappingA
    // id=1: col1 blank → parsed null → would violate non-nullable col1 →
    // whole row reverts. id=9: create with null col1 → dropped.
    val src = Sources.rows(spark, Seq(
      Seq("1", "", "B", "C", "D", "5"),
      Seq("9", "", "J", "K", "L", "1")), headerLines = -1)
    val projected = m.complete(targetSchema).project(src)
    val res = Upsert(target, projected, m, nonNullable = Seq("col1"))
    val merged = res.merged.orderBy("id").collect().toSeq
    assert(merged == Seq(
      Row(1L, "", "", "C", "D", null, 1L),
      Row(2L, "E", "F", "G", "H", 2L, 1L)))
    assert(res.stats.collect().head.getAs[Long]("rejected") == 2L)
  }

  test("on_data_not_found anti-join output") {
    val m = mappingA
    val src = Sources.rows(spark,
      Seq(Seq("1", "A", "B", "C", "D", "5")), headerLines = -1)
    val projected = m.complete(targetSchema).project(src)
    val res = Upsert(target, projected, m)
    val nf = res.notFound.collect().toSeq
    assert(nf == Seq(Row(2L, "E", "F", "G", "H", 2L, 1L)))
    assert(res.stats.collect().head.getAs[Long]("not_found") == 1L)
  }

  test("should_import row filter (importsource.py:98)") {
    val m = mappingA
    val res = ImportPipeline.run(
      target,
      Seq(ImportPipeline.SourceDef(
        source1, m,
        shouldImport = Some(try_element_at(col(Mapping.RawCol), lit(1)) =!= "3"))))
    assert(res.merged.count() == 2) // id=3 filtered out, no create
  }

  test("custom rejectWhen predicate (validate_updates override)") {
    val m = mappingA
    // Reject any row whose incoming col1 is lowercase.
    val src = Sources.rows(spark, Seq(
      Seq("1", "x", "B", "C", "D", "5"),   // rejected → reverts
      Seq("3", "Q", "J", "K", "L", "2")),  // accepted → created
      headerLines = -1)
    val projected = m.complete(targetSchema).project(src)
    val res = Upsert(target, projected, m,
      rejectWhen = Some(col("_src_col1") === lower(col("_src_col1"))))
    val merged = res.merged.orderBy("id").collect().toSeq
    assert(merged.head == Row(1L, "", "", "C", "D", null, 1L)) // reverted
    assert(merged.length == 3 && merged(2).getString(1) == "Q")
    assert(res.stats.collect().head.getAs[Long]("rejected") == 1L)
  }

  test("commit hooks fire around the write (importtask.py:97-111)") {
    val m = mappingA
    val projected = m.complete(targetSchema).project(source1)
    val res = Upsert(target, projected, m)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val path = "target/test-tmp/commit_out"
    ImportPipeline.commit(res.merged, path,
      preCommit = _ => seen += "pre",
      postCommit = _ => seen += "post")
    assert(seen.toSeq == Seq("pre", "post"))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("custom comparator drives change detection (mapping.py:53)") {
    // Case-insensitive comparator: 'e' vs stored 'E' counts as unchanged.
    val m = new Mapping()
    m.auto("id")
    m.auto("col1",
      opts = ColOpts(comparator = Some((a, b) => lower(a) <=> lower(b))))
    val src = Sources.rows(spark,
      Seq(Seq("2", "e")), headerLines = -1)
    val projected = m.complete(targetSchema).project(src)
    val res = Upsert(target.select("id", "col1"), projected, m)
    assert(res.stats.collect().head.getAs[Long]("updated") == 0L)
  }

  test("empty source: merged equals target, everything not_found") {
    val m = mappingA
    val src = Sources.rows(spark, Seq(), headerLines = -1)
    val res = Upsert(target, m.complete(targetSchema).project(src), m)
    assert(res.merged.orderBy("id").collect().toSeq
      == target.orderBy("id").collect().toSeq)
    assert(res.notFound.count() == 2)
    assert(res.stats.collect().head.getAs[Long]("read_keys") == 0L)
  }

  test("empty target: first import creates everything") {
    val m = mappingA
    val emptyTarget = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), targetSchema)
    val projected = m.complete(targetSchema).project(source1)
    val res = Upsert(emptyTarget, projected, m)
    assert(res.merged.count() == 3)
    assert(res.stats.collect().head.getAs[Long]("created") == 3L)
  }

  test("custom key column name (README serialnumber pattern)") {
    val m = new Mapping(keyColumnName = "serial")
    m.auto("serial")
    m.auto("status", opts = ColOpts(keepHistory = true))
    val schema = StructType(Seq(
      StructField("serial", StringType), StructField("status", StringType)))
    val tgt = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("SN-1", "stocked"), Row("SN-2", "shipped")), schema)
    val src = Sources.rows(spark, Seq(
      Seq("SN-1", "shipped"),
      Seq("SN-3", "received")), headerLines = -1)
    val res = Upsert(tgt, m.complete(schema).project(src), m)
    assert(res.merged.orderBy("serial").collect().toSeq == Seq(
      Row("SN-1", "shipped"), Row("SN-2", "shipped"),
      Row("SN-3", "received")))
    assert(res.history.collect().toSeq == Seq(Row("SN-1", "stocked", "shipped")))
  }

  private val dupSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("frozen", StringType), // should_update = false
    StructField("fill", StringType), //   should_update_only_if_null
    StructField("last", StringType))) //  default policy

  private def dupMapping = {
    val m = new Mapping()
    m.auto("id")
    m.auto("frozen", opts = ColOpts(shouldUpdate = false))
    m.auto("fill", opts = ColOpts(shouldUpdateOnlyIfNull = true))
    m.auto("last")
    m
  }

  // Three rows, same key: reference creates the item from the first and
  // routes later rows through the update policies (importtask.py:262-277).
  private def dupSource = Sources.rows(spark, Seq(
    Seq("9", "f1", "", "l1"),
    Seq("9", "f2", "x2", "l2"),
    Seq("9", "f3", "x3", "l3")), headerLines = -1)

  test("intra-source duplicates, create path: first-row create + policies") {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), dupSchema)
    val m = dupMapping
    val merged = Upsert(empty, m.complete(dupSchema).project(dupSource), m)
      .merged.collect().toSeq
    // frozen: first row's value; fill: first NON-null ("" parses to null);
    // last: last row's value.
    assert(merged == Seq(Row(9L, "f1", "x2", "l3")))
  }

  test("intra-source duplicates, create-only mode: first row wholesale") {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), dupSchema)
    val m = dupMapping
    val merged = Upsert(empty, m.complete(dupSchema).project(dupSource), m,
      mode = Create).merged.collect().toSeq
    // A just-created item can't be updated in CREATE mode, so later dups
    // are ignored entirely (importtask.py:245-248).
    assert(merged == Seq(Row(9L, "f1", null, "l1")))
  }

  test("intra-source duplicates, matched path: only_if_null fills once") {
    val tgt = spark.createDataFrame(
      java.util.Arrays.asList(Row(9L, "tf", null, "tl")), dupSchema)
    val m = dupMapping
    val merged = Upsert(tgt, m.complete(dupSchema).project(dupSource), m)
      .merged.collect().toSeq
    // frozen: target value stays; fill: target null → first non-null dup;
    // last: last dup.
    assert(merged == Seq(Row(9L, "tf", "x2", "l3")))
  }

  test("should_import rows are counted as ignored (importtask.py:303)") {
    val res = ImportPipeline.run(
      target,
      Seq(ImportPipeline.SourceDef(source1, mappingA,
        shouldImport = Some(element_at(col(Mapping.RawCol), 1) =!= "3"))))
    assert(res.merged.filter($"id" === 3L).count() == 0)
    val stats = res.stats.head.head()
    assert(stats.getAs[Long]("ignored") == 1L)
    assert(stats.getAs[Long]("read_keys") == 2L)
    // ignored is checked BEFORE the missing-key check, so the blank-id row
    // still counts as missing, not ignored.
    assert(stats.getAs[Long]("ignored_missing_id") == 1L)
  }

  test("nonNullableFromSchema mirrors the reference model inference") {
    // importtask.py:383-391: non-nullable, non-key columns reject nulls.
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("score", LongType, nullable = true)))
    assert(Upsert.nonNullableFromSchema(schema) == Seq("name"))
    val src = Sources.rows(spark, Seq(
      Seq("1", "", "5"), // blank name parses to null → rejected create
      Seq("2", "ok", "6")), headerLines = -1)
    val m = new Mapping()
    m.auto("id"); m.auto("name"); m.auto("score")
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val res = Upsert(empty, m.complete(schema).project(src), m,
      nonNullable = Upsert.nonNullableFromSchema(schema))
    assert(res.merged.collect().toSeq == Seq(Row(2L, "ok", 6L)))
    assert(res.stats.head.getAs[Long]("rejected") == 1L)
  }

  test("key comparator normalizes join keys (mapping.py:522)") {
    val m = new Mapping() {
      override def keyComparator = c => trim(lower(c))
    }
    m.auto("id", c => c) // string key
    m.auto("col1")
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("col1", StringType)))
    val tgt = spark.createDataFrame(
      java.util.Arrays.asList(Row("ABC", "x")), schema)
    val src = Sources.rows(spark,
      Seq(Seq("  abc ", "y")), headerLines = -1)
    val res = Upsert(tgt, m.complete(schema).project(src), m)
    assert(res.stats.collect().head.getAs[Long]("updated") == 1L)
    assert(res.merged.head.getString(1) == "y")
  }
}
