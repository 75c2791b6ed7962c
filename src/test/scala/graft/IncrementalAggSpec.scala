package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.{IncrementalAgg, ManifestTable}

class IncrementalAggSpec extends SparkSpec {
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

  private def viewOf(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getAs[Number](2).longValue)).toSet

  test("feed-maintained view equals a full recompute across merges and " +
      "deletes") {
    val root = "target/test-tmp/incr_agg"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val m = mapping
    // v0: three groups
    ManifestTable.merge(raw((1L, "a", "10"), (2L, "a", "5"), (3L, "b", "7"),
      (4L, "c", "1")).transform(m.project), 0L, m, root, schema,
      numBuckets = 4, streamId = "S")
    // v1: update moves id 2 from group a to b; create id 5 in a
    ManifestTable.merge(raw((2L, "b", "20"), (5L, "a", "2"))
      .transform(m.project), 1L, m, root, schema, streamId = "S")
    // v2: delete id 4 — group c disappears entirely
    ManifestTable.delete(spark, root, schema, "id", Seq(4L), token = 9L)
    val cur = ManifestTable.currentVersion(spark, root).get

    val maintained = IncrementalAgg.maintainedView(spark, root, schema,
      "id", Seq("grp"), Seq("v"), 0L, cur)
    val recomputed = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, root, schema), Seq("grp"), Seq("v"))
    assert(viewOf(maintained) == viewOf(recomputed),
      s"maintained ${viewOf(maintained)} != recomputed ${viewOf(recomputed)}")
    // and the numbers are what they should be
    assert(viewOf(maintained) ==
      Set(("a", 2L, 12L), ("b", 2L, 27L)),
      s"group c (count 0) must leave the view: ${viewOf(maintained)}")
  }

  test("delta-mode merges feed the same maintained view") {
    val root = "target/test-tmp/incr_agg_delta"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "10"), (2L, "b", "5"))
      .transform(m.project), 0L, m, root, schema, numBuckets = 2,
      streamId = "S")
    ManifestTable.merge(raw((1L, "a", "100"), (3L, "b", "3"))
      .transform(m.project), 1L, m, root, schema, streamId = "S",
      delta = true)
    val cur = ManifestTable.currentVersion(spark, root).get
    val maintained = IncrementalAgg.maintainedView(spark, root, schema,
      "id", Seq("grp"), Seq("v"), 0L, cur)
    assert(viewOf(maintained) == Set(("a", 1L, 100L), ("b", 2L, 8L)))
  }

  test("follower loop: refresh steps track the table across commits") {
    val root = "target/test-tmp/incr_agg_follow"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val m = mapping
    ManifestTable.merge(raw((1L, "a", "10"), (2L, "b", "5"))
      .transform(m.project), 0L, m, root, schema, numBuckets = 2,
      streamId = "S")
    // bootstrap at v0
    var state = (IncrementalAgg.fullAgg(
      ManifestTable.read(spark, root, schema), Seq("grp"), Seq("v")), 0L)
    // no new commits: the step is a no-op returning the same state
    val same = IncrementalAgg.refresh(spark, root, schema, "id",
      Seq("grp"), Seq("v"), state)
    assert(same._2 == 0L && (same._1 eq state._1))
    // two commits land between polls; one refresh catches both up
    ManifestTable.merge(raw((1L, "a", "100"), (3L, "c", "7"))
      .transform(m.project), 1L, m, root, schema, streamId = "S",
      delta = true)
    ManifestTable.delete(spark, root, schema, "id", Seq(2L), token = 5L)
    state = IncrementalAgg.refresh(spark, root, schema, "id",
      Seq("grp"), Seq("v"), state)
    assert(state._2 == 2L)
    assert(viewOf(state._1) == Set(("a", 1L, 100L), ("c", 1L, 7L)))
    // another commit, another step — the carried state keeps tracking
    ManifestTable.merge(raw((4L, "c", "3")).transform(m.project), 2L, m,
      root, schema, streamId = "S")
    state = IncrementalAgg.refresh(spark, root, schema, "id",
      Seq("grp"), Seq("v"), state)
    assert(state._2 == 3L)
    assert(viewOf(state._1) == Set(("a", 1L, 100L), ("c", 2L, 10L)))
  }

  private def viewMm(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
      r.getAs[Number](4).longValue)).toSet

  test("min/max maintenance: delete of the attaining row triggers a " +
      "partial recompute that equals the full recompute") {
    val root = "target/test-tmp/incr_agg_minmax"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val m = mapping
    ManifestTable.merge(raw(
      (1L, "a", "10"), (2L, "a", "5"), (3L, "a", "7"),
      (4L, "b", "1"), (5L, "b", "9")).transform(m.project),
      0L, m, root, schema, numBuckets = 4, streamId = "S")
    // delete id 1 — group a LOSES its max (10); group b is untouched
    ManifestTable.delete(spark, root, schema, "id", Seq(1L), token = 9L)
    val cur = ManifestTable.currentVersion(spark, root).get
    val maintained = IncrementalAgg.maintainedView(spark, root, schema,
      "id", Seq("grp"), Seq("v"), 0L, cur, minMaxCols = Seq("v"))
    val recomputed = IncrementalAgg.fullAgg(
      ManifestTable.read(spark, root, schema), Seq("grp"), Seq("v"),
      Seq("v"))
    assert(viewMm(maintained) == viewMm(recomputed))
    assert(viewMm(maintained) ==
      Set(("a", 2L, 12L, 5L, 7L), ("b", 2L, 10L, 1L, 9L)),
      s"group a's max must fall back to 7: ${viewMm(maintained)}")
  }

  test("min/max maintenance: inserts and non-extremal deletes never " +
      "read the snapshot") {
    // the lazy-snapshot contract: improving inserts and deletes of
    // interior values maintain feed-only — the thunk must not evaluate
    val view = IncrementalAgg.fullAgg(
      Seq((1L, "a", 10L), (2L, "a", 3L), (3L, "b", 5L))
        .toDF("id", "grp", "v"), Seq("grp"), Seq("v"), Seq("v"))
    val feed = Seq(
      (4L, "a", Some(20L), "insert"), // improves a's max
      (2L, "a", Some(3L), "delete"), // interior? 3 is a's MIN — suspect!
      (5L, "c", Some(7L), "insert")) // new group
      .toDF("id", "grp", "v", "_change_type")
    // deleting a's min IS extremal: expect exactly one snapshot read
    var reads = 0
    val snap = () => {
      reads += 1
      Seq((1L, "a", 10L), (4L, "a", 20L), (3L, "b", 5L), (5L, "c", 7L))
        .toDF("id", "grp", "v")
    }
    val out = IncrementalAgg.applyChanges(view, feed, Seq("grp"),
      Seq("v"), Seq("v"), snap)
    assert(viewMm(out) == Set(("a", 2L, 30L, 10L, 20L),
      ("b", 1L, 5L, 5L, 5L), ("c", 1L, 7L, 7L, 7L)))
    assert(reads == 1, "suspect group a must trigger one snapshot read")

    // now a feed with no extremal loss at all: the thunk must stay cold
    val feed2 = Seq(
      (6L, "b", Some(9L), "insert"),
      (7L, "b", Some(4L), "insert"))
      .toDF("id", "grp", "v", "_change_type")
    var reads2 = 0
    val out2 = IncrementalAgg.applyChanges(out, feed2, Seq("grp"),
      Seq("v"), Seq("v"), () => { reads2 += 1; sys.error("must not") })
    assert(viewMm(out2) == Set(("a", 2L, 30L, 10L, 20L),
      ("b", 3L, 18L, 4L, 9L), ("c", 1L, 7L, 7L, 7L)))
    assert(reads2 == 0, "no lost extremum → snapshot never read")
  }

  test("NULL group keys and NULL sum values maintain correctly") {
    // fullAgg/applyChanges contract: NULL group is a real group (NULL-safe
    // join), NULL values count 0 toward sums.
    val view = IncrementalAgg.fullAgg(
      Seq((1L, null: String, 10L), (2L, "g", 5L))
        .toDF("id", "grp", "v"), Seq("grp"), Seq("v"))
    val feed = Seq(
      (3L, null: String, Some(7L), "insert"),
      (4L, "g", None: Option[Long], "insert"),
      (1L, null: String, Some(10L), "update_preimage"),
      (1L, null: String, Some(1L), "update_postimage"))
      .toDF("id", "grp", "v", "_change_type")
    val out = IncrementalAgg.applyChanges(view, feed, Seq("grp"), Seq("v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(out == Set((None, 2L, 8L), (Some("g"), 2L, 5L)), s"got $out")
  }
}
