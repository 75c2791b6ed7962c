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

  test("probeJoin prunes the base read through the index and equals " +
      "the plain join; outer refuses; over-cap falls back") {
    val base = fresh("six_pj_base"); val idx = fresh("six_pj_idx")
    val m = mapping
    ManifestTable.merge(
      raw((1L to 400L).map(i => (i, s"g${i % 40}", i.toString)): _*)
        .transform(m.project),
      0L, m, base, schema, numBuckets = 16, streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, "grp",
      numBuckets = 8)
    SecondaryIndex.create(spark, ix)
    val dim = Seq(("g3", "x"), ("g17", "y")).toDF("g", "tag")
    val pruned = SecondaryIndex.probeJoin(spark, ix, dim, Seq("g"))
    val plain = ManifestTable.read(spark, base, schema)
      .join(dim, col("grp") === col("g"))
    assert(pruned.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq)
    assert(pruned.count() == 20) // 2 values x 10 keys each
    val full = ManifestTable.read(spark, base, schema).inputFiles.length
    assert(pruned.inputFiles.length < full,
      s"probeJoin read ${pruned.inputFiles.length} of $full base files")
    // left_semi: base columns only, unique rows
    val semi = SecondaryIndex.probeJoin(spark, ix, dim, Seq("g"),
      joinType = "left_semi")
    assert(semi.columns.toSeq == Seq("id", "grp", "v"))
    assert(semi.count() == 20)
    // outer refuses
    val e = intercept[IllegalArgumentException] {
      SecondaryIndex.probeJoin(spark, ix, dim, Seq("g"), "left_outer")
    }
    assert(e.getMessage.contains("unsound"))
    // over the cap: full-scan join, same rows
    val fallback = SecondaryIndex.probeJoin(spark, ix, dim, Seq("g"),
      maxDriverKeys = 1)
    assert(fallback.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq)
    assert(fallback.inputFiles.length == full)
    // null dim values drop instead of probing
    val dimN = Seq((Some("g3"), "x"), (None, "y")).toDF("g", "tag")
    assert(SecondaryIndex.probeJoin(spark, ix, dimN, Seq("g"))
      .count() == 10)
  }

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

  test("composite index: refresh, partial-NULL rows and composite " +
      "lookups behave like a two-column WHERE") {
    val schema2 = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("sub", StringType), StructField("v", LongType)))
    val m2 = new Mapping()
    m2.auto("id"); m2.auto("grp"); m2.auto("sub"); m2.auto("v")
    m2.complete(schema2)
    def raw2(rows: (Long, String, String, Long)*): DataFrame =
      rows.zipWithIndex.map { case ((id, g, s, v), i) =>
        (Seq(id.toString, g, s, v.toString), i.toLong) }
        .toDF("_raw", "_line")
    val base = fresh("six_base_c"); val idx = fresh("six_idx_c")
    // id 4 has an empty (→ NULL) sub: NOT indexed (a row is indexed
    // iff every component is non-NULL)
    ManifestTable.merge(raw2((1L, "a", "x", 1L), (2L, "a", "y", 2L),
      (3L, "b", "x", 3L), (4L, "a", "", 4L)).transform(m2.project),
      0L, m2, base, schema2, numBuckets = 4, streamId = "S")
    val ix = SecondaryIndex.Index(base, schema2, "id", idx,
      Seq("grp", "sub"), numBuckets = 4)
    SecondaryIndex.create(spark, ix)
    def expected2(): Map[(String, String), Seq[Long]] =
      ManifestTable.read(spark, base, schema2)
        .filter($"grp".isNotNull && $"sub".isNotNull).collect()
        .map(r => ((r.getString(1), r.getString(2)), r.getLong(0)))
        .groupBy(_._1).map { case (gs, ks) =>
          (gs, ks.map(_._2).toSeq.sorted) }
    def contents2(): Map[(String, String), Seq[Long]] =
      SecondaryIndex.read(spark, ix).collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getSeq[Long](2)))
        .toMap
    // the synthetic key column stays internal
    assert(SecondaryIndex.read(spark, ix).columns.toSeq ==
      Seq("grp", "sub", "keys"))
    assert(contents2() == expected2())
    // moves across ONE component, NULL-ing a component (drops out of
    // the index), filling a NULL component (drops in)
    ManifestTable.merge(raw2((2L, "a", "x", 20L), (3L, "b", "", 3L),
      (4L, "a", "z", 4L)).transform(m2.project),
      1L, m2, base, schema2, streamId = "S")
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(contents2() == expected2(), "after component-level moves")
    assert(!contents2().keys.exists(_ == ("b", "x")),
      "emptied composite value must vanish")
    // composite point lookup = two-column WHERE on the base
    val hit = SecondaryIndex.lookupBy(spark, ix, Seq("a", "x"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(hit == Seq(1L, 2L), s"$hit")
    // index-only multi-probe
    val pairs = SecondaryIndex.lookupValues(spark, ix,
        Seq(Seq("a", "x"), Seq("a", "z"), Seq("no", "pe")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(pairs == Set(("a", "x", 1L), ("a", "x", 2L), ("a", "z", 4L)),
      s"$pairs")
    // probe arity is validated loudly
    intercept[IllegalArgumentException] {
      SecondaryIndex.lookupBy(spark, ix, Seq("a"))
    }
  }

  test("range-layout index: BETWEEN equals the full-scan filter, " +
      "prunes index files, and survives refresh") {
    val base = fresh("six_base_r"); val idx = fresh("six_idx_r")
    val m = mapping
    // values v05..v28 spread over ids 1..24
    ManifestTable.merge(
      raw((1L to 24L).map(i => (i, f"v${i + 4}%02d", i.toString)): _*)
        .transform(m.project),
      0L, m, base, schema, numBuckets = 8, streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, Seq("grp"),
      numBuckets = 4, rangeLayout = true)
    SecondaryIndex.create(spark, ix)
    def wantRange(lo: String, hi: String): Seq[Long] =
      ManifestTable.read(spark, base, schema)
        .filter($"grp" >= lo && $"grp" <= hi)
        .select("id").as[Long].collect().sorted.toSeq
    val got = SecondaryIndex.lookupRange(spark, ix, "v08", "v13")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == wantRange("v08", "v13") && got.nonEmpty, s"$got")
    // the index-side read must be PRUNED: the range touches fewer
    // bucket files than the full index
    val idxSchema = StructType(Seq(StructField("grp", StringType),
      StructField("keys", ArrayType(LongType))))
    val pruned = ManifestTable.lookupRange(spark, idx, idxSchema,
      "grp", "v08", "v13")
    val full = ManifestTable.read(spark, idx, idxSchema)
    assert(pruned.inputFiles.toSet.subsetOf(full.inputFiles.toSet) &&
      pruned.inputFiles.length < full.inputFiles.length,
      s"range scan must not read the whole index: " +
        s"${pruned.inputFiles.length} of ${full.inputFiles.length}")
    // maintenance keeps the layout: move one key into range, one out
    ManifestTable.merge(raw((1L, "v09", "1"), (10L, "zz", "10"))
      .transform(m.project), 1L, m, base, schema, streamId = "S")
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(SecondaryIndex.lookupRange(spark, ix, "v08", "v13")
      .select("id").as[Long].collect().sorted.toSeq ==
      wantRange("v08", "v13"))
    // the degraded-collect path returns the same rows
    assert(SecondaryIndex.lookupRange(spark, ix, "v08", "v13",
        maxDriverKeys = 1)
      .select("id").as[Long].collect().sorted.toSeq ==
      wantRange("v08", "v13"))
    // an empty range is empty, not an error
    assert(SecondaryIndex.lookupRange(spark, ix, "x", "y").count() == 0L)
  }

  test("hot-value sharding: a value owning a million keys stores " +
      "bounded rows, refresh touches only the changed key's shards, " +
      "and the lookup surface is shard-transparent") {
    val base = fresh("six_base_hot"); val idx = fresh("six_idx_hot")
    val m = mapping
    val n = 1000000L
    val nShards = 16
    // one pathological value ("en") owning ~all keys, a small one ("fr")
    val df = spark.range(n).select(col("id"),
      when(col("id") < n - 10, lit("en")).otherwise(lit("fr")).as("grp"),
      col("id").as("v"))
    ManifestTable.merge(df, 0L, m, base, schema, numBuckets = 8,
      streamId = "S")
    val ix = SecondaryIndex.Index(base, schema, "id", idx, Seq("grp"),
      numBuckets = 8, numShards = nShards)
    SecondaryIndex.create(spark, ix)
    // STORED shape: no row may hold more than ~2x the even shard share
    // of the hot value — the unbounded-array row is the failure mode
    val stored = StructType(Seq(
      StructField("grp", StringType),
      StructField("_shard", IntegerType),
      StructField("keys", ArrayType(LongType)),
      StructField("_gkey", StringType)))
    val sizes = ManifestTable.read(spark, idx, stored)
      .select(size(col("keys"))).as[Int].collect()
    assert(sizes.sum == n, s"index must cover every key: ${sizes.sum}")
    assert(sizes.max <= 2 * n / nShards,
      s"a shard row exceeded twice the even share: max ${sizes.max}")
    // lookups are shard-transparent
    assert(SecondaryIndex.lookupBy(spark, ix, "fr")
      .select("id").as[Long].collect().sorted.toSeq ==
      (n - 10 until n).toSeq)
    assert(SecondaryIndex.lookupValues(spark, ix, Seq("fr"))
      .count() == 10L)
    // the merged read equals the ground truth for the small value
    assert(SecondaryIndex.read(spark, ix).filter($"grp" === "fr")
      .select(explode($"keys")).as[Long].collect().sorted.toSeq ==
      (n - 10 until n).toSeq)
    // refresh: move ONE key en→fr. Cost must track the CHANGE (the two
    // touched (value, shard) rows' buckets), never the hot value's
    // million-key list — the index table rewrites at most 2 of its 8
    // bucket files.
    val before = ManifestTable.currentManifest(spark, idx).get.entries
      .map(e => e.bucket -> e.relPath).toMap
    ManifestTable.merge(
      spark.range(1).select(col("id"), lit("fr").as("grp"),
        col("id").as("v")),
      1L, m, base, schema, streamId = "S")
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    val after = ManifestTable.currentManifest(spark, idx).get.entries
      .map(e => e.bucket -> e.relPath).toMap
    val changed = after.count { case (b, p) => before.get(b) != Some(p) }
    assert(changed <= 2,
      s"moving one key must rewrite at most its two shard rows' " +
        s"buckets, rewrote $changed of ${after.size}")
    assert(SecondaryIndex.lookupBy(spark, ix, "fr").count() == 11L)
    // per-row bound survives maintenance
    val sizes2 = ManifestTable.read(spark, idx, stored)
      .select(size(col("keys"))).as[Int].collect()
    assert(sizes2.sum == n && sizes2.max <= 2 * n / nShards)
    // emptying a value removes ALL its shard rows
    ManifestTable.delete(spark, base, schema, "id",
      (n - 10 until n) :+ 0L, token = 9L)
    assert(SecondaryIndex.refresh(spark, ix).isDefined)
    assert(SecondaryIndex.lookupBy(spark, ix, "fr").count() == 0L)
    assert(SecondaryIndex.read(spark, ix).filter($"grp" === "fr")
      .count() == 0L)
    // replay: already current
    assert(SecondaryIndex.refresh(spark, ix).isEmpty)
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
