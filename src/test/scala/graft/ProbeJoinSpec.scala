package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** [[ManifestTable.probeJoin]] — dim-driven dynamic file pruning for
  * joins. The driver gate (`manifest_probe_join`) pins the VALUES
  * against DuckDB; these specs pin the part the oracle can't see: the
  * pruned read touches strictly fewer files than the full scan, the
  * over-cap fallback stays correct, and the comparator / null-key /
  * join-type contracts hold. */
class ProbeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mkTable(root: String, n: Int = 16): Unit =
    ManifestTable.create(
      (1L to 400L).map(i => (i, i * 10)).toDF("id", "v"),
      "id", root, numBuckets = n)

  private def dim(keys: Long*): DataFrame =
    keys.map(k => (k, s"d$k")).toDF("cust", "tag")

  test("pruned inner join equals the plain join and reads fewer files") {
    val root = freshRoot("probe_join_basic")
    mkTable(root)
    val d = dim(3L, 17L, 99L)
    val pruned = ManifestTable.probeJoin(spark, root, schema, d, "cust")
    val plain = ManifestTable.read(spark, root, schema)
      .join(d, col("id") === col("cust"))
    assert(pruned.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq)
    assert(pruned.count() == 3)
    // the I/O claim: 3 probe keys touch ≤3 of 16 buckets' files
    val full = ManifestTable.read(spark, root, schema).inputFiles.length
    val read = pruned.inputFiles.length
    assert(read <= 3 && read < full,
      s"pruned join read $read of $full files")
  }

  test("over the driver-key cap it falls back to the full-scan join, " +
      "same rows") {
    val root = freshRoot("probe_join_cap")
    mkTable(root)
    val d = dim(1L, 2L, 3L, 4L, 5L)
    val fallback = ManifestTable.probeJoin(spark, root, schema, d, "cust",
      maxDriverKeys = 3) // 5 distinct keys > 3: must NOT prune
    val plain = ManifestTable.read(spark, root, schema)
      .join(d, col("id") === col("cust"))
    assert(fallback.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq)
    assert(fallback.inputFiles.length ==
      ManifestTable.read(spark, root, schema).inputFiles.length)
  }

  test("left_semi returns only fact columns; outer joins refuse") {
    val root = freshRoot("probe_join_semi")
    mkTable(root)
    val d = dim(7L, 7L, 8L) // dup dim keys: semi output still unique
    val semi = ManifestTable.probeJoin(spark, root, schema, d, "cust",
      joinType = "left_semi")
    assert(semi.columns.toSeq == Seq("id", "v"))
    assert(semi.orderBy("id").collect().toSeq ==
      Seq(Row(7L, 70L), Row(8L, 80L)))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.probeJoin(spark, root, schema, d, "cust",
        joinType = "left_outer")
    }
    assert(e.getMessage.contains("unsound"))
  }

  test("dup dim rows multiply inner output like a plain join") {
    val root = freshRoot("probe_join_dup")
    mkTable(root)
    val d = dim(5L, 5L)
    assert(ManifestTable.probeJoin(spark, root, schema, d, "cust")
      .count() == 2)
  }

  test("null dim keys drop; all-null dim joins empty") {
    val root = freshRoot("probe_join_null")
    mkTable(root)
    val d = Seq((Some(9L), "a"), (None, "b")).toDF("cust", "tag")
    val got = ManifestTable.probeJoin(spark, root, schema, d, "cust")
    assert(got.select("id").as[Long].collect().toSeq == Seq(9L))
    val allNull = Seq((Option.empty[Long], "b")).toDF("cust", "tag")
    assert(ManifestTable.probeJoin(spark, root, schema, allNull, "cust")
      .count() == 0)
  }

  test("comparator table: raw-cased dim keys match normalized rows " +
      "on both the probe and the join condition") {
    val root = freshRoot("probe_join_cmp")
    val strSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val lowerCmp: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      lower(_)
    ManifestTable.create(
      Seq(("Foo", 1L), ("BAR", 2L), ("baz", 3L)).toDF("k", "v"),
      "k", root, numBuckets = 4, keyComparator = lowerCmp)
    val d = Seq(("FOO", "x"), ("bar", "y")).toDF("cust", "tag")
    val got = ManifestTable.probeJoin(spark, root, strSchema, d, "cust",
        keyComparator = lowerCmp)
      .select("k", "tag").orderBy("k").collect().toSeq
    assert(got == Seq(Row("BAR", "y"), Row("Foo", "x")))
  }

  test("SQL face: graft_probe_join prunes and matches the plain join") {
    GraftExtensions.register(spark)
    val root = freshRoot("probe_join_sql")
    mkTable(root)
    dim(3L, 17L, 99L).createOrReplaceTempView("pj_dim")
    val got = spark.sql("SELECT * FROM graft_probe_join(" +
      s"'$root', 'id BIGINT, v BIGINT', " +
      "'SELECT * FROM pj_dim', 'cust') ORDER BY id")
    assert(got.collect().map(r => (r.getLong(0), r.getString(3))).toSeq
      == Seq((3L, "d3"), (17L, "d17"), (99L, "d99")))
    assert(got.inputFiles.length <= 3)
    val semi = spark.sql("SELECT * FROM graft_probe_join(" +
      s"'$root', 'id BIGINT, v BIGINT', " +
      "'SELECT * FROM pj_dim', 'cust', 'left_semi')")
    assert(semi.columns.toSeq == Seq("id", "v"))
    assert(semi.count() == 3)
  }

  test("dim key of a narrower numeric type casts to the table key " +
      "before bucket targeting") {
    val root = freshRoot("probe_join_cast")
    mkTable(root)
    val d = Seq((3, "x"), (17, "y")).toDF("cust", "tag") // INT vs LONG key
    val got = ManifestTable.probeJoin(spark, root, schema, d, "cust")
    assert(got.select("id").as[Long].collect().toSeq.sorted ==
      Seq(3L, 17L))
    assert(got.inputFiles.length <= 2)
  }
}
