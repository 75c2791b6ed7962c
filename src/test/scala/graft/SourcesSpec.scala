package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.mapping.Mapping
import graft.sources.{CsvLine, CsvRecords, Sources}

class SourcesSpec extends SparkSpec {

  test("CsvLine quote-aware split (csv.reader semantics)") {
    assert(CsvLine.split("a,b,c") == Seq("a", "b", "c"))
    assert(CsvLine.split("a,\"b,c\",d") == Seq("a", "b,c", "d"))
    assert(CsvLine.split("\"say \"\"hi\"\"\",x") == Seq("say \"hi\"", "x"))
    assert(CsvLine.split("a,,c") == Seq("a", "", "c"))
    assert(CsvLine.split("") == Seq(""))
    assert(CsvLine.split(",") == Seq("", ""))
  }

  test("csv source skips header lines per file (importsource.py:154)") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("src.csv")
    Files.writeString(f,
      "id,name,region\n1,\"Alpha, Inc\",5\n2,Beta,7\n3,\"say \"\"hi\"\"\",9\n")

    val df = Sources.csv(spark, f.toString, headerLines = 0)
    val got = df.orderBy(Mapping.LineCol)
      .select(col(Mapping.RawCol), col(Mapping.LineCol))
      .collect().map(r => (r.getSeq[String](0), r.getLong(1))).toSeq
    assert(got == Seq(
      (Seq("1", "Alpha, Inc", "5"), 1L),
      (Seq("2", "Beta", "7"), 2L),
      (Seq("3", "say \"hi\"", "9"), 3L)))

    // headerLines = -1 keeps everything.
    assert(Sources.csv(spark, f.toString, -1).count() == 4)
    // headerLines = 1 skips two lines.
    assert(Sources.csv(spark, f.toString, 1).count() == 2)
  }

  test("csv source + mapping + inference end-to-end") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("typed.csv")
    Files.writeString(f,
      "id,name,when\n1,Alpha,02/01/2020\n2, Beta ,01.24.2020\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("when",
        org.apache.spark.sql.types.DateType)))
    val m = new Mapping()
    m.auto("id"); m.auto("name"); m.auto("when")
    val out = m.complete(schema).project(Sources.csv(spark, f.toString))
      .orderBy("id").select("id", "name", "when").collect().toSeq
    assert(out == Seq(
      Row(1L, "Alpha", java.sql.Date.valueOf("2020-01-02")),
      Row(2L, "Beta", java.sql.Date.valueOf("2020-01-24"))))
  }

  test("csvFor honors the mapping's headerLineNumber") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("two_header.csv")
    Files.writeString(f, "junk\nid,name\n1,a\n")
    val m = new Mapping() { override def headerLineNumber: Int = 1 }
    assert(Sources.csvFor(spark, f.toString, m).count() == 1)
  }

  test("csv source plan: one text scan, no RDD boundary, no exchange") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("planshape.csv")
    Files.writeString(f, "id,name\n1,a\n")
    val df = Sources.csv(spark, f.toString, headerLines = 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD boundary in plan:\n$plan")
    assert(!plan.contains("Exchange"), s"shuffle in csv plan:\n$plan")
    assert("FileScan".r.findAllIn(plan).size == 1,
      s"expected exactly one scan:\n$plan")
  }

  test("CsvRecords quote-aware record split (multiline csv.reader)") {
    // embedded newline stays inside the quoted field
    assert(CsvRecords.records("1,\"a\nb\",x\n2,c,d\n")
      == Seq("1,\"a\nb\",x", "2,c,d"))
    // \r\n normalized, trailing newline adds no empty record
    assert(CsvRecords.records("a,b\r\nc,d\r\n") == Seq("a,b", "c,d"))
    // interior blank line is a record; doubled quotes stay verbatim
    assert(CsvRecords.records("a\n\n\"say \"\"hi\"\"\"\n")
      == Seq("a", "", "\"say \"\"hi\"\"\""))
    // mid-field quote is literal, not a state change
    assert(CsvRecords.records("ab\"cd\ne,f") == Seq("ab\"cd", "e,f"))
  }

  test("multiline csv source parses embedded-newline records " +
      "(importsource.py:168-171)") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("multiline.csv")
    // mirrors python csv.reader output:
    //   ['id','name','notes'], ['1','alpha\nbeta','x'],
    //   ['2','say "hi"','y'], ['3','plain','a,b'], [], ['4','last','z']
    Files.writeString(f,
      "id,name,notes\n1,\"alpha\nbeta\",x\n2,\"say \"\"hi\"\"\",y\n" +
      "3,plain,\"a,b\"\n\n4,last,z\n")
    val got = Sources.csv(spark, f.toString, headerLines = 0,
        multiline = true)
      .orderBy(Mapping.LineCol)
      .select(col(Mapping.RawCol), col(Mapping.LineCol))
      .collect().map(r => (r.getSeq[String](0), r.getLong(1))).toSeq
    assert(got == Seq(
      (Seq("1", "alpha\nbeta", "x"), 1L),
      (Seq("2", "say \"hi\"", "y"), 2L),
      (Seq("3", "plain", "a,b"), 3L),
      (Seq(""), 4L), // blank line: csv.reader yields [], line mode [""]
      (Seq("4", "last", "z"), 5L)))
  }

  test("line mode rejects embedded-newline records loudly") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp")).toAbsolutePath
    val f = dir.resolve("torn_quote.csv")
    Files.writeString(f, "id,name\n1,\"alpha\nbeta\",x\n")
    val e = intercept[Exception] {
      Sources.csv(spark, f.toString, headerLines = 0).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("multiline")),
      s"expected a loud multiline hint, got: ${messages(e)}")
  }

  test("multi-file csv source skips the header in EVERY file") {
    val dir = Files.createDirectories(
      Paths.get("target/test-tmp/multicsv")).toAbsolutePath
    Files.writeString(dir.resolve("part1.csv"), "id,name\n1,a\n2,b\n")
    Files.writeString(dir.resolve("part2.csv"), "id,name\n3,c\n")
    val df = Sources.csv(spark, dir.toString + "/*.csv", headerLines = 0)
    val got = df.select(col(Mapping.RawCol)).collect()
      .map(_.getSeq[String](0).head).sorted.toSeq
    assert(got == Seq("1", "2", "3")) // no header row leaked through
  }

  test("jsonl source: nested dotted paths, file-order line index") {
    val dir = "target/test-tmp/jsonl_src"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    Files.writeString(Paths.get(s"$dir/part.jsonl"),
      """{"id": 1, "meta": {"tag": "a"}, "v": 10}
        |{"id": 2, "meta": {"tag": "b"}, "v": 20}
        |{"id": 1, "meta": {"tag": "c"}, "v": 30}
        |""".stripMargin)
    val jschema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("tag",
            org.apache.spark.sql.types.StringType)))),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val raw = Sources.jsonl(spark, dir, jschema)
    // line index is file-ordered from 0 (single block)
    assert(raw.select(col("id"), col(Mapping.LineCol)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toSeq ==
      Seq((1L, 0L), (2L, 1L), (1L, 2L)))
    // dotted-path Field mapping reads the nested attribute
    val m = new Mapping()
    m.field("id", path = "id")
    m.field("tag", path = "meta.tag")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)))
    val projected = m.complete(schema).project(raw)
    // last duplicate wins through the standard upsert policy
    val target = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    val merged = graft.operators.Upsert(target, projected, m)
      .merged.orderBy("id").collect().toSeq
    assert(merged == Seq(Row(1L, "c"), Row(2L, "b")))
  }

  test("toCsvLine round-trips through CsvRecords+CsvLine (property)") {
    val rnd = new scala.util.Random(7L)
    val alphabet = "ab,\"\n\r x\u00e9"
    def field() = (0 until rnd.nextInt(8))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows: Seq[Seq[String]] =
      Seq.fill(200)((1 to (1 + rnd.nextInt(4))).map(_ => field()))
    val arity = rows.map(_.length).max
    val padded = rows.map(r => r.padTo(arity, ""))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          padded.map(r => Row(r.toList))).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fs",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    val lines = df.select(Sources.toCsvLine(
        (0 until arity).map(i => col("fs").getItem(i))).as("line"))
      .collect().map(_.getString(0)).toSeq
    // parse the whole rendered file back: record split (quote-aware,
    // multiline fields span physical lines) then field split
    val content = lines.mkString("\n")
    val back = CsvRecords.records(content).map(CsvLine.split)
    assert(back.length == padded.length,
      s"record count ${back.length} != ${padded.length}")
    padded.zip(back).zipWithIndex.foreach { case ((want, got), i) =>
      assert(got == want, s"row $i: want=$want got=$got")
    }
  }

  test("ORC source: round-trips typed rows, and filters + column " +
      "pruning reach the ORC stripe reader (PushedFilters/ReadSchema)") {
    import spark.implicits._
    val root = "target/test-tmp/sources_orc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val rows = (1L to 500L).map(i => (i, s"name$i", i * 3))
    rows.toDF("id", "name", "v").write.orc(root)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val q = Sources.orc(spark, root, schema)
      .filter(org.apache.spark.sql.functions.col("v") >= 1200L)
      .select("id", "v")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == rows.filter(_._3 >= 1200L).map(t => (t._1, t._3)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(v), " +
      "GreaterThanOrEqual(v,1200)]") ||
      plan.contains("GreaterThanOrEqual(v,1200)"),
      s"the filter must reach the ORC scan:\n$plan")
    assert(!plan.contains("name"),
      "the dropped column must be pruned from the ORC read")
  }
}
