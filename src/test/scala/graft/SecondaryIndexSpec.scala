package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{ManifestTable, SecondaryIndex}

class SecondaryIndexSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def mapping = {
    val m = new Mapping()
    m.auto("id"); m.auto("grp"); m.auto("v")
    m.complete(schema)
    m
  }

  private def raw(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, g, v), i) => (Seq(id.toString, g, v), i.toLong) }
      .toDF("_raw", "_line")

  private def fresh(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def contents(ix: SecondaryIndex.Index)
      : Map[String, Seq[Long]] =
    SecondaryIndex.read(spark, ix).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  private def expected(base: String): Map[String, Seq[Long]] =
    ManifestTable.read(spark, base, schema)
      .filter($"grp".isNotNull).collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .map { case (g, ks) => (g, ks.map(_._2).toSeq.sorted) }

  test("index tracks inserts, cross-value moves, deletes and NULLs " +
      "across refreshes") {
    val base = fresh("six_base"); val idx = fresh("six_idx")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "a", "2"),
      (3L, "b", "3"), (4L, "", "4")).transform(m.project),
      0L, m, base, schema, numBuckets = 4, streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, "grp",
      numBuckets = 4)
    SecondaryIndex.create(spark, ix)
    assert(contents(ix) == expected(base))

    // move id 2 a→b, insert id 5 in c, update id 1 in place (value
    // change only — its index entry must survive untouched)
    ManifestTable.merge(raw((2L, "b", "20"), (5L, "c", "5"),
      (1L, "a", "100")).transform(m.project),
      1L, m, base, schema, streamId = "S")
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(contents(ix) == expected(base), "after cross-value moves")

    // delete both members of b: the value's index row must VANISH
    ManifestTable.delete(spark, base, schema, "id", Seq(2L, 3L),
      token = 9L)
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(contents(ix) == expected(base), "after emptying a value")
    assert(!contents(ix).contains("b"))

    // already current → no-op
    assert(SecondaryIndex.refresh(spark, ix).isEmpty)
  }

  test("a key changing value twice within one refresh window lands on " +
      "its final value only") {
    val base = fresh("six_base2"); val idx = fresh("six_idx2")
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "1"), (2L, "z", "2"))
      .transform(m.project), 0L, m, base, schema, numBuckets = 2,
      streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, "grp",
      numBuckets = 2)
    SecondaryIndex.create(spark, ix)
    // two commits BEFORE the refresh: a→b, then b→c
    ManifestTable.merge(raw((1L, "b", "1")).transform(m.project),
      1L, m, base, schema, streamId = "S")
    ManifestTable.merge(raw((1L, "c", "1")).transform(m.project),
      2L, m, base, schema, streamId = "S")
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(contents(ix) == Map("c" -> Seq(1L), "z" -> Seq(2L)),
      s"intermediate value b must never appear: ${contents(ix)}")
  }

  test("lookupBy is two pruned reads and returns exactly the matching " +
      "base rows") {
    val base = fresh("six_base3"); val idx = fresh("six_idx3")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 40L).map(i => (i, s"g${i % 5}", i.toString)): _*)
        .transform(m.project),
      0L, m, base, schema, numBuckets = 8, streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, "grp",
      numBuckets = 4)
    SecondaryIndex.create(spark, ix)
    val hit = SecondaryIndex.lookupBy(spark, ix, "g3")
      .select("id").as[Long].collect().sorted.toSeq
    assert(hit == (1L to 40L).filter(_ % 5 == 3).toSeq, s"$hit")
    // a value that was never indexed returns empty, not an error
    assert(SecondaryIndex.lookupBy(spark, ix, "nope").count() == 0L)
    // a skewed value whose key list exceeds the driver cap degrades to
    // the distributed semi-join path — same rows, no driver collect
    val skewed = SecondaryIndex.lookupBy(spark, ix, "g3",
        maxDriverKeys = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(skewed == hit,
      s"fallback path diverged from the pruned path: $skewed")
  }
}
