package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("a; b et c", "the quick brown fox", "1,\"x,y\",3"))
      .toDF("l", "t", "c").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      """SELECT format_list(l) AS fl, simhash64(t) AS sh,
         csv_line(c) AS cl, shingles(t, 2) AS sg,
         size(minhash_sig(t, 2, 8)) AS ms,
         cosine_sim(array(1.0f, 0f), array(1.0f, 0f)) AS cs,
         hyperplane_bits(array(1.0f, 0f), 4) AS hb
         FROM ext_t""").head
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getSeq[String](2) == Seq("1", "x,y", "3"))
    assert(r.getSeq[String](3).head == "the quick")
    assert(r.getInt(4) == 8)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12)
  }

  test("csv_records splits multiline content from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT transform(
           csv_records('1,"a\nb",x\n2,c,d\n'), r -> csv_line(r)) AS rows""")
      .head.getSeq[Seq[String]](0)
    assert(r == Seq(Seq("1", "a\nb", "x"), Seq("2", "c", "d")))
  }

  test("round-3 kernels are callable from SQL") {
    GraftExtensions.register(spark)
    Seq(Tuple1("the cat and the dog"))
      .toDF("t").createOrReplaceTempView("ext_t3")
    val r = spark.sql(
      """SELECT text_stats(t).n_tokens AS nt,
         text_stats(t).stop_en AS se,
         l2_normalize(array(3.0f, 4.0f)) AS nv
         FROM ext_t3""").head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 3L) // "the" twice + "and"; cat/dog aren't
    val nv = r.getSeq[Float](2)
    assert(math.abs(nv(0) - 0.6f) < 1e-6 && math.abs(nv(1) - 0.8f) < 1e-6)
  }

  test("manifest table reads, time travel and CDC feed from pure SQL") {
    GraftExtensions.register(spark)
    val root = "target/test-tmp/ext_graft_table"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("name")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING")
    m.complete(schema)
    def raw(rows: (Long, String)*) = rows.zipWithIndex
      .map { case ((i, n), l) => (Seq(i.toString, n), l.toLong) }
      .toDF("_raw", "_line")
    // 16 buckets: hashInt(2) and hashLong(2) land in DIFFERENT buckets
    // mod 16 (6 vs 8), so the graft_lookup assertion below would MISS
    // if the SQL integer literal were not cast to the BIGINT key type
    // before bucket targeting (they collide mod 2, which hid the bug).
    graft.store.ManifestTable.merge(m.project(raw(1L -> "a", 2L -> "b")),
      0L, m, root, schema, numBuckets = 16, streamId = "S")
    graft.store.ManifestTable.merge(m.project(raw(2L -> "B", 3L -> "c")),
      1L, m, root, schema, streamId = "S", delta = true)

    val ddl = "'id BIGINT, name STRING'"
    // current state — including the delta reconcile — via SQL only
    val now = spark.sql(
      s"""SELECT id, name FROM graft_table('$root', $ddl) ORDER BY id""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // time travel to v0
    val v0 = spark.sql(
      s"""SELECT id, name FROM graft_table_at('$root', $ddl, 0)
         ORDER BY id""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v0 == Seq((1L, "a"), (2L, "b")))
    // the CDC feed, composed with ordinary SQL
    val feed = spark.sql(
      s"""SELECT _change_type, count(*) AS n
         FROM graft_changes('$root', $ddl, 'id', 0, 1)
         GROUP BY _change_type ORDER BY _change_type""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(feed == Seq(("insert", 1L), ("update_postimage", 1L),
      ("update_preimage", 1L)), s"bad feed: $feed")
    // the metadata-only count (reconciled over the delta bucket)
    val n = spark.sql(s"SELECT n_rows FROM graft_count('$root', $ddl)")
      .head().getLong(0)
    assert(n == 3L, s"graft_count: $n")
    // pruned point read, delta-reconciled
    val hit = spark.sql(
      s"SELECT name FROM graft_lookup('$root', $ddl, 'id', 2)")
      .collect().map(_.getString(0)).toSeq
    assert(hit == Seq("B"), s"graft_lookup: $hit")
  }

  test("table functions reject non-literal and mistyped arguments loudly") {
    GraftExtensions.register(spark)
    // non-foldable argument (a bare column ref is caught upstream by the
    // analyzer; rand() resolves but can't fold) → usage error naming the
    // parameter, not an opaque NPE/UnresolvedException out of eval(null)
    val e1 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_table(cast(rand() AS STRING), 'id BIGINT')")
        .collect()
    }
    assert(e1.getMessage.contains("literal") ||
      Option(e1.getCause).exists(_.getMessage.contains("literal")),
      s"expected a must-be-a-literal usage error, got: ${e1.getMessage}")
    // a STRING version argument is a TAG since r13 (graft_table_at
    // doubles as time travel by name): a non-digit string resolves
    // through the tag registry and an unknown name fails with the
    // tag-lookup error, not a type error
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_table_at('/nowhere', 'id BIGINT', 'seven')")
        .collect()
    }
    assert(e2.getMessage.contains("no tag 'seven'") ||
      Option(e2.getCause).exists(_.getMessage.contains("no tag 'seven'")),
      s"expected a tag-lookup error, got: ${e2.getMessage}")
    // a non-integer NUMERIC version stays a usage error
    val e2b = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_table_at('/nowhere', 'id BIGINT', 1.5)")
        .collect()
    }
    assert(e2b.getMessage.contains("literal") ||
      Option(e2b.getCause).exists(_.getMessage.contains("literal")),
      s"expected an integer-literal usage error, got: ${e2b.getMessage}")
    // integer where the root string belongs
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_table(42, 'id BIGINT')").collect()
    }
    assert(e3.getMessage.contains("string literal") ||
      Option(e3.getCause).exists(_.getMessage.contains("string literal")),
      s"expected a string-literal usage error, got: ${e3.getMessage}")
  }

  test("SQL-only maintenance: merge, ensure-refresh view + index, and " +
      "read back, without touching the Scala API") {
    GraftExtensions.register(spark)
    val base = "target/test-tmp/ext_sql_base"
    val view = "target/test-tmp/ext_sql_view"
    val idx = "target/test-tmp/ext_sql_idx"
    Seq(base, view, idx).foreach(r =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r)))
    val ddl = "id BIGINT, grp STRING, v BIGINT"
    // batch rows come in as temp views — the standard SQL-user shape
    Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L))
      .toDF("id", "grp", "v").createOrReplaceTempView("ext_sql_b0")
    Seq((2L, "b", 20L), (4L, "c", 1L))
      .toDF("id", "grp", "v").createOrReplaceTempView("ext_sql_b1")
    def one(sql: String) = spark.sql(sql).head

    // bootstrap the base table from SQL
    val m0 = one(s"""SELECT * FROM graft_merge('$base', '$ddl', 'id',
      'SELECT * FROM ext_sql_b0', 'S', 0, 4)""")
    assert(m0.getBoolean(1), "first merge must apply")
    // ensure-create both derived tables
    assert(one(s"""SELECT * FROM graft_refresh_view('$base', '$ddl',
      'id', '$view', 'grp', 'v', 'v', 4)""").getString(1) == "created")
    assert(one(s"""SELECT * FROM graft_refresh_index('$base', '$ddl',
      'id', '$idx', 'grp', 4)""").getString(1) == "created")
    // merge batch 1 (a cross-group move + an insert), refresh both
    val m1 = one(s"""SELECT * FROM graft_merge('$base', '$ddl', 'id',
      'SELECT * FROM ext_sql_b1', 'S', 1)""")
    assert(m1.getBoolean(1) && m1.getLong(0) > m0.getLong(0))
    assert(one(s"""SELECT * FROM graft_refresh_view('$base', '$ddl',
      'id', '$view', 'grp', 'v', 'v')""").getString(1) == "refreshed")
    assert(one(s"""SELECT * FROM graft_refresh_index('$base', '$ddl',
      'id', '$idx', 'grp')""").getString(1) == "refreshed")
    // the view read matches a SQL recompute over the base read
    val got = spark.sql(s"""SELECT grp, n_rows, sum_v FROM
      graft_view('$base', '$ddl', 'id', '$view', 'grp', 'v', 'v')""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    val want = spark.sql(s"""SELECT grp, count(*), sum(v)
      FROM graft_table('$base', '$ddl') GROUP BY grp""")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(got == want, s"$got vs $want")
    val idxGot = spark.sql(s"""SELECT grp, id FROM (SELECT grp,
      explode(keys) AS id FROM graft_index('$base', '$ddl', 'id',
      '$idx', 'grp'))""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val idxWant = spark.sql(
      s"""SELECT grp, id FROM graft_table('$base', '$ddl')
         WHERE grp IS NOT NULL""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(idxGot == idxWant, s"$idxGot vs $idxWant")
    // point query through the index from SQL: two pruned reads
    val viaIdx = spark.sql(s"""SELECT id FROM graft_index_lookup('$base',
      '$ddl', 'id', '$idx', 'grp', 'b')""")
      .collect().map(_.getLong(0)).sorted.toSeq
    val direct = spark.sql(s"""SELECT id FROM graft_table('$base', '$ddl')
      WHERE grp = 'b'""").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIdx == direct && viaIdx.nonEmpty, s"$viaIdx vs $direct")
    // sharded index, same SQL surface: create/refresh/lookup with the
    // trailing numShards argument
    val sIdx = "target/test-tmp/ext_sql_idx_sharded"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(sIdx))
    assert(one(s"""SELECT * FROM graft_refresh_index('$base', '$ddl',
      'id', '$sIdx', 'grp', 4, 4)""").getString(1) == "created")
    val viaShards = spark.sql(s"""SELECT id FROM graft_index_lookup(
      '$base', '$ddl', 'id', '$sIdx', 'grp', 'b', 4)""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaShards == direct, s"sharded lookup diverged: $viaShards")
    // bloom skipping from SQL: build filters, then a pruned point read
    assert(one(s"""SELECT * FROM graft_bloom_build('$base', '$ddl',
      'grp')""").getInt(0) > 0)
    assert(one(s"""SELECT * FROM graft_bloom_build('$base', '$ddl',
      'grp')""").getInt(0) == 0, "second build must be a no-op")
    val viaBloom = spark.sql(s"""SELECT id FROM graft_bloom_lookup(
      '$base', '$ddl', 'grp', 'b')""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == direct, s"bloom lookup diverged: $viaBloom")
    // zone skipping from SQL: min/max sidecars, then a pruned range read
    assert(one(s"""SELECT * FROM graft_zone_build('$base', '$ddl',
      'v')""").getInt(0) > 0)
    assert(one(s"""SELECT * FROM graft_zone_build('$base', '$ddl',
      'v')""").getInt(0) == 0, "second zone build must be a no-op")
    val viaZone = spark.sql(s"""SELECT id FROM graft_zone_lookup(
      '$base', '$ddl', 'v', 5, 10)""")
      .collect().map(_.getLong(0)).sorted.toSeq
    val directRange = spark.sql(s"""SELECT id FROM graft_table('$base',
      '$ddl') WHERE v BETWEEN 5 AND 10""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaZone == directRange && viaZone.nonEmpty,
      s"zone lookup diverged: $viaZone vs $directRange")
    // one-sided range: hi = NULL means unbounded above
    assert(spark.sql(s"""SELECT id FROM graft_zone_lookup('$base',
      '$ddl', 'v', 20, NULL)""").collect().map(_.getLong(0)).toSeq ==
      spark.sql(s"""SELECT id FROM graft_table('$base', '$ddl')
        WHERE v >= 20""").collect().map(_.getLong(0)).toSeq)
    // replayed merge (same stream/batch token) must not apply; the
    // follow-up refreshes are noops
    assert(!one(s"""SELECT * FROM graft_merge('$base', '$ddl', 'id',
      'SELECT * FROM ext_sql_b1', 'S', 1)""").getBoolean(1),
      "replayed batch must be a no-op")
    assert(one(s"""SELECT * FROM graft_refresh_view('$base', '$ddl',
      'id', '$view', 'grp', 'v', 'v')""").getString(1) == "noop")
    assert(one(s"""SELECT * FROM graft_refresh_index('$base', '$ddl',
      'id', '$idx', 'grp')""").getString(1) == "noop")
    // point-in-time restore from SQL: rewind to the bootstrap commit —
    // metadata-only, and the replay token makes a retry a no-op
    val r0 = one(
      s"SELECT * FROM graft_restore('$base', ${m0.getLong(0)}, 99)")
    assert(r0.getBoolean(1) && r0.getLong(0) > m1.getLong(0))
    val restored = spark.sql(s"SELECT id FROM graft_table('$base', '$ddl')")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(restored == Seq(1L, 2L, 3L), s"restored state: $restored")
    assert(!one(
      s"SELECT * FROM graft_restore('$base', ${m0.getLong(0)}, 99)")
      .getBoolean(1), "replayed restore must be a no-op")
  }

  test("temporal SQL literals keep their type: TIMESTAMP/DATE bounds " +
      "and probes do not collapse to internal longs/ints") {
    GraftExtensions.register(spark)
    val root = "target/test-tmp/ext_temporal"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123456"),
        java.sql.Date.valueOf("2020-01-05")),
      (2L, java.sql.Timestamp.valueOf("2020-03-15 06:30:00"),
        java.sql.Date.valueOf("2020-03-15")),
      (3L, java.sql.Timestamp.valueOf("2021-07-01 12:00:00"),
        java.sql.Date.valueOf("2021-07-01")))
      .toDF("id", "ts", "day")
    graft.store.ManifestTable.create(df, "id", root, numBuckets = 4)
    val ddl = "id BIGINT, ts TIMESTAMP, day DATE"
    assert(spark.sql(s"""SELECT * FROM graft_zone_build('$root', '$ddl',
      'ts,day')""").head.getInt(0) > 0)
    // a TIMESTAMP literal bound evals internally to epoch MICROS: fed
    // untyped into lit().cast(timestamp) it re-reads as SECONDS — a
    // garbage instant ~50k years out that silently filters everything
    val viaTs = spark.sql(s"""SELECT id FROM graft_zone_lookup('$root',
      '$ddl', 'ts', TIMESTAMP '2020-01-01 00:00:00.123456',
      TIMESTAMP '2020-06-01 00:00:00')""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaTs == Seq(1L, 2L),
      s"timestamp-literal bounds filtered wrongly: $viaTs")
    // a DATE literal evals to an Int of epoch days, where the untyped
    // int→date cast outright fails
    val viaDay = spark.sql(s"""SELECT id FROM graft_zone_lookup('$root',
      '$ddl', 'day', DATE '2020-01-01', DATE '2020-12-31')""")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaDay == Seq(1L, 2L),
      s"date-literal bounds filtered wrongly: $viaDay")
    // bloom probes share the fix
    assert(spark.sql(s"""SELECT * FROM graft_bloom_build('$root', '$ddl',
      'day')""").head.getInt(0) > 0)
    assert(spark.sql(s"""SELECT id FROM graft_bloom_lookup('$root',
      '$ddl', 'day', DATE '2020-03-15')""")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // and graft_lookup probing a TIMESTAMP-typed key-adjacent column
    // stays consistent with the direct read
    val direct = spark.sql(s"""SELECT id FROM graft_table('$root', '$ddl')
      WHERE ts = TIMESTAMP '2021-07-01 12:00:00'""")
      .collect().map(_.getLong(0)).toSeq
    assert(direct == Seq(3L))
  }

  test("clusterBy from SQL: token-replayed re-layout, then a " +
      "zone-pruned range read over the clustered files") {
    GraftExtensions.register(spark)
    val root = "target/test-tmp/ext_cluster"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val df = (1L to 200L).map(i => (i, i * 10L)).toDF("id", "v")
    graft.store.ManifestTable.create(df, "id", root, numBuckets = 4)
    val ddl = "id BIGINT, v BIGINT"
    val r = spark.sql(s"""SELECT * FROM graft_cluster_by('$root', '$ddl',
      'id', 'v', 11, 4)""").head
    assert(r.getBoolean(1), "first clusterBy must apply")
    assert(!spark.sql(s"""SELECT * FROM graft_cluster_by('$root', '$ddl',
      'id', 'v', 11, 4)""").head.getBoolean(1),
      "token replay must be a no-op")
    assert(spark.sql(s"""SELECT * FROM graft_zone_build('$root', '$ddl',
      'v')""").head.getInt(0) > 0)
    val got = spark.sql(s"""SELECT id FROM graft_zone_lookup('$root',
      '$ddl', 'v', 500, 990)""").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (50L to 99L), s"clustered zone lookup diverged: $got")
  }

  test("SQL lifecycle maintenance: graft_versions, graft_compact, " +
      "graft_vacuum") {
    GraftExtensions.register(spark)
    val root = "target/test-tmp/ext_sql_maint"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val ddl = "id BIGINT, grp STRING, v BIGINT"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val m = new graft.mapping.Mapping(keyColumnName = "id")
    schema.fieldNames.foreach(n => m.auto(n))
    m.complete(schema)
    // v0 bootstrap + two DELTA merges: tiered buckets for compact
    graft.store.ManifestTable.merge(
      Seq((1L, "a", 10L), (2L, "a", 5L), (3L, "b", 7L))
        .toDF("id", "grp", "v"), 0L, m, root, schema,
      numBuckets = 2, streamId = "S")
    graft.store.ManifestTable.merge(
      Seq((1L, "a", 11L)).toDF("id", "grp", "v"), 1L, m, root, schema,
      streamId = "S", delta = true)
    graft.store.ManifestTable.merge(
      Seq((2L, "a", 6L)).toDF("id", "grp", "v"), 2L, m, root, schema,
      streamId = "S", delta = true)
    def one(sql: String) = spark.sql(sql).head
    // DESCRIBE HISTORY-equivalent: all three committed versions
    val vs = spark.sql(s"SELECT * FROM graft_versions('$root')")
      .collect().map(_.getLong(0)).toSeq
    assert(vs == Seq(0L, 1L, 2L))
    // compact folds the delta-carrying buckets; the replayed token
    // no-ops without committing
    val c1 = one(s"SELECT * FROM graft_compact('$root', '$ddl', 'id', 7)")
    assert(c1.getLong(0) == 3L && c1.getInt(1) >= 1,
      s"expected a compacting commit, got $c1")
    val c2 = one(s"SELECT * FROM graft_compact('$root', '$ddl', 'id', 7)")
    assert(c2.getLong(0) == 3L && c2.getInt(1) == 0,
      "a replayed compact token must not commit again")
    // vacuum to the head: one version left, reads stay exact
    assert(one(s"SELECT * FROM graft_vacuum('$root')").getInt(0) == 1)
    assert(spark.sql(s"SELECT * FROM graft_versions('$root')")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    val state = spark.sql(
      s"SELECT id, v FROM graft_table('$root', '$ddl') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(state == Seq((1L, 11L), (2L, 6L), (3L, 7L)))
    // the write-shaped ones carry the in-view refusal
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW ext_maint_v AS
      SELECT * FROM graft_vacuum('$root')""")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ext_maint_v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot be wrapped in a view")))
  }

  test("graft_rename_column: metadata-only rename from SQL; reads, " +
      "key lookups and sidecar rebuilds follow the new name") {
    GraftExtensions.register(spark)
    val root = "target/test-tmp/ext_sql_rename"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val ddl = "id BIGINT, grp STRING, v BIGINT"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val m = new graft.mapping.Mapping(keyColumnName = "id")
    schema.fieldNames.foreach(n => m.auto(n))
    m.complete(schema)
    graft.store.ManifestTable.merge(
      (0L until 40L).map(i => (i, s"g${i % 4}", i * 10))
        .toDF("id", "grp", "v"), 0L, m, root, schema,
      numBuckets = 4, streamId = "S")

    val r = spark.sql(
      s"SELECT * FROM graft_rename_column('$root', 'v', 'amount')").head
    assert(r.getLong(0) == 1L && r.getString(1) == "amount")
    val newDdl = "id BIGINT, grp STRING, amount BIGINT"
    assert(spark.sql(
      s"SELECT sum(amount) FROM graft_table('$root', '$newDdl')")
      .head.getLong(0) == (0L until 40L).map(_ * 10).sum)
    // self-describing read also speaks the new name
    assert(spark.sql(s"SELECT * FROM graft_table('$root')")
      .schema.fieldNames.toSeq == Seq("id", "grp", "amount"))
    // sidecars REBUILD under the new name and prune-read correctly
    // (the build reads the files' physical names underneath)
    assert(graft.store.BloomSkip.buildBlooms(spark, root,
      org.apache.spark.sql.types.StructType.fromDDL(newDdl),
      Seq("amount")) > 0)
    val hits = graft.store.BloomSkip.lookupByColumn(spark, root,
      org.apache.spark.sql.types.StructType.fromDDL(newDdl),
      "amount", 130L)
    assert(hits.collect().map(_.getLong(0)).toSeq == Seq(13L),
      "bloom-pruned read on the renamed column must find its row")
  }

  test("maintenance functions refuse to resolve inside a view body: a " +
      "temp-view wrapper cannot silently re-run the merge per SELECT") {
    GraftExtensions.register(spark)
    val base = "target/test-tmp/ext_sql_guard"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    Seq((1L, "a", 10L)).toDF("id", "grp", "v")
      .createOrReplaceTempView("ext_sql_gb")
    val ddl = "id BIGINT, grp STRING, v BIGINT"
    val mergeSql = s"""SELECT * FROM graft_merge('$base', '$ddl', 'id',
      'SELECT * FROM ext_sql_gb', 'S', 0, 2)"""
    // direct call: fine (and commits version 1)
    assert(spark.sql(mergeSql).head.getBoolean(1))
    // wrapped in a view: the view body's (re-)resolution must fail
    // loudly instead of re-running the merge on every SELECT
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW ext_guard_v AS $mergeSql")
    val before = graft.store.ManifestTable
      .currentVersion(spark, base).get
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ext_guard_v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cannot be wrapped in a view")),
      s"expected the loud in-view refusal, got: ${msgs(e)}")
    assert(graft.store.ManifestTable.currentVersion(spark, base)
      .contains(before),
      "the refused view read must not have committed another merge")
  }

  test("to_csv_line renders and round-trips from SQL") {
    val row = spark.sql(
      """SELECT to_csv_line('a', 'has,comma', 'quote"inside') AS line""")
      .head.getString(0)
    assert(row == "a,\"has,comma\",\"quote\"\"inside\"")
    // SQL-level round-trip: csv_line parses what to_csv_line rendered
    val back = spark.sql(
      s"""SELECT csv_line(to_csv_line('x,y', 'z"w', '')) AS fs""")
      .head.getSeq[String](0)
    assert(back == Seq("x,y", "z\"w", ""))
  }
}
