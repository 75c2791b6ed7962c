package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** `spark.read.format("graft")` — the batch-read face of the manifest
  * table (GraftTableProvider + GraftReadStrategy). */
class GraftFormatSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

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

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("format('graft') reads the self-described table, schema inferred") {
    val root = freshRoot("gf_basic")
    val df = (1L to 100L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "nm", "x")
    ManifestTable.create(df, "id", root, numBuckets = 8)
    val t = spark.read.format("graft").load(root)
    assert(t.schema == df.schema)
    assert(sortedRows(t) == sortedRows(df))
  }

  test("filters and projections prune through the format read") {
    val root = freshRoot("gf_prune")
    val df = (1L to 200L).map(i => (i, s"n$i", i * 2.0)).toDF("id", "nm", "x")
    ManifestTable.create(df, "id", root, numBuckets = 16)
    val q = spark.read.format("graft").load(root)
      .filter(col("id") === 42L).select(col("nm"), (col("x") + 1).as("y"))
    assert(scannedFiles(q) == 1, "key predicate prunes to one bucket file")
    assert(sortedRows(q) == Seq("n42|85.0"))
    // the pruned scan also column-prunes: no `id`-only read of x
    val rs = scans(q.queryExecution.executedPlan).head.schema.fieldNames.toSet
    assert(rs == Set("id", "nm", "x") || !rs.contains("id") ||
      rs.subsetOf(Set("id", "nm", "x")))
  }

  test("versionAsOf time travel") {
    val root = freshRoot("gf_tt")
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType)))
    ManifestTable.create(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"),
      "id", root, numBuckets = 4)
    // amend through delete (new version)
    ManifestTable.delete(spark, root, sch, "id", Seq(2L), token = 1L)
    val v0 = spark.read.format("graft").option("versionAsOf", 0).load(root)
    val v1 = spark.read.format("graft").load(root)
    assert(sortedRows(v0) == Seq("1|10", "2|20"))
    assert(sortedRows(v1) == Seq("1|10"))
  }

  test("SQL over a temp view of the format read stays pruned") {
    val root = freshRoot("gf_sql")
    val df = (1L to 120L).map(i => (i, s"n$i")).toDF("id", "nm")
    ManifestTable.create(df, "id", root, numBuckets = 8)
    spark.read.format("graft").load(root).createOrReplaceTempView("gf_t")
    val q = spark.sql("SELECT nm FROM gf_t WHERE id = 7")
    assert(scannedFiles(q) == 1)
    assert(sortedRows(q) == Seq("n7"))
  }

  test("self-join of the same table resolves both sides") {
    val root = freshRoot("gf_self")
    val df = (1L to 50L).map(i => (i, i % 7)).toDF("id", "g")
    ManifestTable.create(df, "id", root, numBuckets = 4)
    val a = spark.read.format("graft").load(root).as("a")
    val b = spark.read.format("graft").load(root).as("b")
    val j = a.join(b, $"a.id" === $"b.id").select($"a.id", $"b.g")
    assert(j.count() == 50)
  }

  test("delta state reads reconciled through the format") {
    val root = freshRoot("gf_delta")
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("nm", StringType), StructField("score", LongType)))
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("nm"); m.auto("score")
    m.complete(sch)
    def raw(rows: (Long, String, String)*): DataFrame =
      rows.zipWithIndex.map { case ((id, n, s), i) =>
        (Seq(id.toString, n, s), i.toLong) }.toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw((1L to 30L).map(i =>
      (i, s"n$i", i.toString)): _*)), 0L, m, root, sch, numBuckets = 4)
    ManifestTable.merge(m.project(raw((9L, "NEW", "900"))), 1L, m, root,
      sch, delta = true)
    val t = spark.read.format("graft").load(root)
    assert(t.count() == 30)
    assert(sortedRows(t.filter(col("id") === 9L)) == Seq("9|NEW|900"))
  }

  test("write face: create, append-merge, overwrite-replace, ignore") {
    val root = freshRoot("gf_write")
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "nm", "v")
    base.write.format("graft").option("key", "id")
      .option("numBuckets", "4").save(root)
    assert(sortedRows(spark.read.format("graft").load(root)) ==
      Seq("1|a|10", "2|b|20", "3|c|30"))
    // ErrorIfExists is the default: a second bare save refuses
    val e = intercept[Exception] {
      base.write.format("graft").option("key", "id").save(root)
    }
    assert(e.getMessage.contains("exists"))
    // append = incremental key-matched merge (update 2, insert 4)
    Seq((2L, "B", 200L), (4L, "d", 40L)).toDF("id", "nm", "v")
      .write.format("graft").mode("append").option("key", "id").save(root)
    assert(sortedRows(spark.read.format("graft").load(root)) ==
      Seq("1|a|10", "2|B|200", "3|c|30", "4|d|40"))
    // append applies on every bare save (SQL INSERT semantics, fresh
    // default token per call)
    Seq((5L, "e", 50L)).toDF("id", "nm", "v")
      .write.format("graft").mode("append").option("key", "id").save(root)
    assert(spark.read.format("graft").load(root).count() == 5)
    // overwrite = INSERT OVERWRITE: absent keys are gone, time travel
    // still reads the pre-overwrite version
    val preVersion = ManifestTable.currentVersion(spark, root).get
    Seq((7L, "z", 70L)).toDF("id", "nm", "v")
      .write.format("graft").mode("overwrite").option("key", "id").save(root)
    assert(sortedRows(spark.read.format("graft").load(root)) == Seq("7|z|70"))
    assert(spark.read.format("graft")
      .option("versionAsOf", preVersion).load(root).count() == 5)
    // ignore: no-op on an existing table
    Seq((9L, "q", 90L)).toDF("id", "nm", "v")
      .write.format("graft").mode("ignore").option("key", "id").save(root)
    assert(sortedRows(spark.read.format("graft").load(root)) == Seq("7|z|70"))
  }

  test("write face: delta append and add-only evolution") {
    val root = freshRoot("gf_write_delta")
    (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v")
      .write.format("graft").option("key", "id")
      .option("numBuckets", "4").save(root)
    Seq((3L, 999L)).toDF("id", "v")
      .write.format("graft").mode("append").option("key", "id")
      .option("delta", "true").save(root)
    val m = ManifestTable.currentManifest(spark, root).get
    assert(m.entries.size == 5, "delta file added, no bucket rewritten")
    assert(sortedRows(spark.read.format("graft").load(root)
      .filter(col("id") === 3L)) == Seq("3|999"))
    // widening append refuses without the opt-in, applies with it
    val widened = Seq((21L, 210L, "x")).toDF("id", "v", "extra")
    val e = intercept[Exception] {
      widened.write.format("graft").mode("append").option("key", "id")
        .save(root)
    }
    assert(e.getMessage.contains("evolveSchema"))
    widened.write.format("graft").mode("append").option("key", "id")
      .option("evolveSchema", "true").save(root)
    val back = spark.read.format("graft").load(root)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(back.filter(col("extra").isNotNull).count() == 1)
  }

  test("usage errors are loud") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft").load("target/test-tmp/gf_missing_xyz")
    }
    assert(e1.getMessage.contains("records no schema"))
    val root = freshRoot("gf_badv")
    ManifestTable.create(Seq((1L, 1L)).toDF("id", "v"), "id", root,
      numBuckets = 2)
    val e2 = intercept[Exception] {
      spark.read.format("graft").option("versionAsOf", 99).load(root)
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("m99") ||
      e2.getMessage.contains("99"))
  }
}
