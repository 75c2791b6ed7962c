package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Avro, Sources}

/** Pins the Avro container source/writer: type round-trip (incl.
  * nested struct / array / map / date / timestamp / binary and
  * nullables), sync-marker SPLIT exactness (every row exactly once
  * across maxPartitionBytes ranges), reader-schema projection
  * (decode-level pruning + missing-field defaults + int→long
  * promotion), and the staged-commit write discipline. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  private val root = "target/avro-spec"

  private def fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType, nullable = true),
      StructField("rank", IntegerType, nullable = false))),
      nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = true),
      nullable = true),
    StructField("attrs", MapType(StringType, LongType,
      valueContainsNull = true), nullable = true),
    StructField("day", DateType, nullable = true),
    StructField("at", TimestampType, nullable = true),
    StructField("blob", BinaryType, nullable = true)))

  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(i.toLong,
      if (i % 7 == 0) null else s"name-$i",
      if (i % 5 == 0) null else i * 1.5,
      i % 2 == 0,
      if (i % 11 == 0) null else Row(s"l${i % 3}", i % 100),
      if (i % 13 == 0) null else Seq(s"t$i", null, s"u${i % 4}"),
      if (i % 17 == 0) null else Map(s"k${i % 3}" -> i.toLong),
      if (i % 19 == 0) null
      else java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(18000 + i % 300)),
      if (i % 23 == 0) null else {
        val ts = new java.sql.Timestamp(1600000000000L + i * 1000L)
        ts.setNanos((i % 1000) * 1000) // micros survive
        ts
      },
      if (i % 29 == 0) null else Array.tabulate(4)(b => (i + b).toByte))
  }

  test("type round-trip: every supported Spark type survives " +
      "write -> read bit-exactly, nulls included") {
    val dir = s"$root/types"
    val rows = mkRows(200)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), fullSchema)
    Avro.write(df, dir)
    val back = Avro.read(spark, dir, fullSchema)
    assert(back.count() == 200)
    // sort-free comparison: exceptAll both ways over a canonical
    // projection (binary compares by value via base64)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("blob", base64(col("blob")))
        // set ops refuse MAP columns: compare as sorted entry arrays
        .withColumn("attrs", array_sort(map_entries(col("attrs"))))
    assert(canon(back).exceptAll(canon(df)).isEmpty)
    assert(canon(df).exceptAll(canon(back)).isEmpty)
  }

  test("splits: a multi-MB file read under a 1 MB maxPartitionBytes " +
      "yields every row exactly once across >1 tasks") {
    val dir = s"$root/splits"
    val big = spark.range(30000).select(col("id"),
      concat(lit("x" * 90), col("id").cast("string")).as("pad"))
    // ONE file so the split logic (not file parallelism) carries
    Avro.write(big.repartition(1), dir)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("pad", StringType)))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${1 << 20}")
      val back = Avro.read(spark, dir, schema)
      assert(back.rdd.getNumPartitions > 1,
        "a ~3 MB file at 1 MB split size must fan out")
      assert(back.count() == 30000)
      assert(back.select(countDistinct("id")).head().getLong(0) == 30000)
      assert(back.agg(sum("id")).head().getLong(0) ==
        30000L * 29999L / 2L)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("reader-schema projection: subset decode, missing nullable " +
      "field defaults to null, int widens to long") {
    val dir = s"$root/proj"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1, "a", Row("en", 5)),
        Row(2, "b", Row("fr", 7))),
      StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("meta", StructType(Seq(
          StructField("lang", StringType, nullable = true),
          StructField("rank", IntegerType, nullable = false))),
          nullable = true))))
    Avro.write(df, dir)
    // subset + promotion: id int->long; meta pruned to lang only
    val projected = Avro.read(spark, dir, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType, nullable = true))),
        nullable = true))))
    assert(projected.orderBy("id").collect().toSeq.map(r =>
      (r.getLong(0), r.getStruct(1).getString(0))) ==
      Seq((1L, "en"), (2L, "fr")))
    // a reader field the writer lacks resolves to its null default
    val widened = Avro.read(spark, dir, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("extra", StringType, nullable = true))))
    assert(widened.orderBy("id").collect().toSeq.map(r =>
      (r.getLong(0), r.isNullAt(1))) == Seq((1L, true), (2L, true)))
  }

  test("Sources.avro: _line rides, Field dotted paths address the " +
      "nested struct, and the write is staged (_SUCCESS present)") {
    val dir = s"$root/mapped"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(10L, Row("en", "web")), Row(11L, Row("fr", "books"))),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("meta", StructType(Seq(
          StructField("lang", StringType, nullable = true),
          StructField("source", StringType, nullable = true))),
          nullable = true))))
    Avro.write(df, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
    val m = new graft.mapping.Mapping()
    m.field("id", path = "doc_id")
    m.field("lang", path = "meta.lang")
    val out = m.complete(StructType(Seq(
      StructField("id", LongType),
      StructField("lang", StringType))))
      .project(Sources.avro(spark, dir, df.schema))
    assert(out.columns.contains(graft.mapping.Mapping.LineCol))
    assert(out.drop(graft.mapping.Mapping.LineCol)
      .orderBy("id").collect().toSeq.map(r =>
        (r.getLong(0), r.getString(1))) ==
      Seq((10L, "en"), (11L, "fr")))
  }

  test("unsupported types refuse loudly at plan time") {
    val err = intercept[IllegalArgumentException] {
      Avro.write(spark.range(1).select(
        col("id").cast(DecimalType(10, 2)).as("d")), s"$root/bad")
    }
    assert(err.getMessage.contains("does not support"))
  }
}
