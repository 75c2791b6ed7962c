package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Parsers => P}
import graft.mapping._
import graft.sources.Sources

/** Mirrors reference tests/mapping_columns_test.py over a Spark projection. */
class MappingSpec extends SparkSpec {

  private val targetSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("col1", StringType,
      metadata = new MetadataBuilder().putLong("maxlength", 1).build()),
    StructField("col2", StringType),
    StructField("col5", LongType)))

  test("indexed column extract + parser (test_column)") {
    val m = new Mapping()
    m.auto("id", P.str2intnullable)
    m.auto("col1", P.str2intnullable)
    val raw = Sources.rows(spark,
      Seq(Seq("1", "2"), Seq("-1", "-2"), Seq("", "1"), Seq("2", "")),
      headerLines = -1)
    val got = m.project(raw).orderBy(Mapping.LineCol)
      .select("id", "col1").collect().toSeq
    assert(got == Seq(
      Row(1L, 2L), Row(-1L, -2L), Row(null, 1L), Row(2L, null)))
  }

  test("auto/col registration with A1N1 (test_mappedcolumn)") {
    val m = new Mapping()
    val id = m.col("id", "A")
    val col1 = m.auto("col1")
    assert(id.index == 0)
    assert(col1.index == 1)
    m.complete(targetSchema) // infers parsers: id → int, col1 → str(max 1)
    val raw = Sources.rows(spark, Seq(Seq("1", ""), Seq("2", "E")), -1)
    val got = m.project(raw).orderBy(Mapping.LineCol)
      .select("id", "col1").collect().toSeq
    assert(got == Seq(Row(1L, null), Row(2L, "E")))
  }

  test("col() resets the auto counter (mapping.py:494)") {
    val m = new Mapping()
    val a = m.col("x", "F") // index 5
    val b = m.auto("y")
    assert(a.index == 5 && b.index == 6)
  }

  test("out-of-range column (test_column_outofrange)") {
    // Lenient: reference returns "" (mapping.py:160-162) — the raw value
    // is empty string; a nullable parser then turns it into NULL.
    val m = new Mapping()
    m.auto("id", c => c, ColOpts(failOnOutOfRange = false))
    m.auto("s", P.str2strnullable(_), ColOpts(failOnOutOfRange = false))
    val raw = Sources.rows(spark, Seq(Seq()), -1)
    val got = m.project(raw).select("id", "s").head
    assert(got.getString(0) == "")
    assert(got.isNullAt(1))
    // Strict (the reference default): out-of-range fails the job, the
    // distributed analogue of the uncaught IndexError.
    val strict = new Mapping()
    strict.auto("id", c => c)
    val e = intercept[Exception] {
      strict.project(raw).select("id").head
    }
    assert(e.getMessage.contains("INVALID_ARRAY_INDEX"),
      s"expected array index error, got: ${e.getMessage}")
  }

  test("computed column (test_computedcolumn)") {
    val m = new Mapping()
    val c0 = IndexedCol(0, Some(P.str2intnullable))
    val c1 = IndexedCol(1, Some(P.str2intnullable))
    m.computed("total", Seq(c0, c1),
      cs => coalesce(cs(0), lit(0L)) + coalesce(cs(1), lit(0L)))
    m.static("id", 1) // key needed for complete()
    val raw = Sources.rows(spark,
      Seq(Seq("1", "2"), Seq("1", ""), Seq("", "2")), -1)
    val got = m.project(raw).orderBy(Mapping.LineCol)
      .select("total").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 2L))
  }

  test("static column (test_staticcolumn)") {
    val m = new Mapping()
    m.static("id", 1)
    val raw = Sources.rows(spark, Seq(Seq()), -1)
    assert(m.project(raw).select("id").head.getInt(0) == 1)
  }

  test("field with dotted-path traversal (test_field / mapping.py:359)") {
    import spark.implicits._
    val df = Seq((1L, ("E", 2L)), (2L, ("F", 3L)))
      .toDF("id", "nested")
      .select(col("id"),
        col("nested._1").as("c"),
        struct(col("nested._1").as("inner")).as("rel"))
    val m = new Mapping()
    m.field("id")
    m.field("c")
    m.field("deep", path = "rel.inner")
    m.complete(df.schema.add("deep", StringType))
    val got = m.project(Sources.table(df, Some(col("id"))))
      .orderBy("id").select("id", "c", "deep").collect().toSeq
    assert(got == Seq(Row(1L, "E", "E"), Row(2L, "F", "F")))
  }

  test("computed field (test_computedfield-ish)") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("id", "a", "b")
    val m = new Mapping()
    m.field("id")
    val fa = FieldCol(Some("a"))
    val fb = FieldCol(Some("b"))
    m.computedField("sum", Seq(fa, fb), cs => cs(0) + cs(1))
    m.complete(df.schema.add("sum", LongType))
    val got = m.project(Sources.table(df)).select("id", "sum").head
    assert(got == Row(1L, 5L))
  }

  test("parser inference dispatch (mapping.py:583-598)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("b", BooleanType),
      StructField("f", DoubleType),
      StructField("s", StringType,
        metadata = new MetadataBuilder().putLong("maxlength", 2).build()),
      StructField("d", DateType),
      StructField("ts", TimestampType)))
    val m = new Mapping()
    m.auto("id"); m.auto("b"); m.auto("f"); m.auto("s"); m.auto("d")
    m.auto("ts")
    m.complete(schema)
    val raw = Sources.rows(spark,
      Seq(Seq("7", "oui", "1.5", " foobar ", "02/01/2020",
        "2020-01-02 03:04:05")), -1)
    val r = m.project(raw).select("id", "b", "f", "s", "d", "ts").head
    assert(r.getLong(0) == 7L)
    assert(r.getBoolean(1))
    assert(r.getDouble(2) == 1.5)
    assert(r.getString(3) == "fo")
    assert(r.getDate(4).toString == "2020-01-02")
  }

  test("diagnostics surface parse errors and empty warnings") {
    val m = new Mapping()
    m.auto("id")
    m.auto("s", opts = ColOpts(warnIfEmpty = true))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val raw = Sources.rows(spark, Seq(
      Seq("42", "ok"),      // clean
      Seq("foobar", "x"),   // id parse error
      Seq("7", "  "),       // s empty
      Seq("", "y")), -1)    // id empty raw → not a parse error
    val d = m.complete(schema).diagnostics(raw)
      .orderBy("line", "column").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
    assert(d == Seq(
      (1L, "id", "foobar", "parse_error"),
      (2L, "s", "  ", "empty")))
  }

  test("export formats model columns with formatter/header (mapping.py:54)") {
    import spark.implicits._
    val df = Seq((1L, Option(2.5), Option("ok")), (2L, None, None))
      .toDF("id", "v", "s")
    val m = new Mapping()
    m.field("id")
    m.field("v", opts = ColOpts(formatter = Some(P.dumpPercentage),
      header = Some("Pct")))
    m.field("s")
    m.complete(df.schema)
    val got = m.export(df).orderBy("id").collect().toSeq
    assert(m.export(df).columns.toSeq == Seq("id", "Pct", "s"))
    assert(got == Seq(Row("1", "250.0", "ok"), Row("2", "0.0", "")))
  }

  test("missing key column fails complete (mapping.py:631)") {
    val m = new Mapping()
    m.auto("col1")
    val e = intercept[IllegalArgumentException](m.complete(targetSchema))
    assert(e.getMessage.contains("Could not find key column id"))
  }
}
