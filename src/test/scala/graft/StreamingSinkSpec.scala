package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable
import graft.streaming.{CdcSource, TableSinkProvider}

/** `writeStream.format("graft-table")`: manifest tables as a first-class
  * streaming sink — per-batch incremental merge, exactly-once via the
  * replay ledger, and the declarative CDC→transform→sink pipeline. */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sc: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val sinkFormat = classOf[TableSinkProvider].getName

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private def freshDir(name: String): String = {
    val dir = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def state(root: String): Set[Seq[Any]] =
    ManifestTable.read(spark, root).collect()
      .toSet.map((r: Row) => r.toSeq.toList: Seq[Any])

  test("micro-batches upsert into the table; later batches update keys") {
    val root = freshDir("sink_basic")
    val ckpt = freshDir("sink_basic_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "4")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, "a", 10L), (2L, "b", 20L))
      q.processAllAvailable()
      assert(state(root) == Set(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))

      mem.addData((2L, "B", 21L), (3L, "c", 30L))
      q.processAllAvailable()
      assert(state(root) == Set(
        Seq(1L, "a", 10L), Seq(2L, "B", 21L), Seq(3L, "c", 30L)))
    } finally q.stop()
  }

  test("declared CHECK constraints gate the sink's micro-batches: a " +
      "violating batch fails the stream, nothing commits, and the " +
      "table stays clean") {
    val root = freshDir("sink_cons")
    val ckpt = freshDir("sink_cons_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    def start() = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "2")
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try { mem.addData((1L, "a", 10L)); q1.processAllAvailable() }
    finally q1.stop()
    ManifestTable.addConstraint(spark, root, "score_pos", "score > 0")
    val v0 = ManifestTable.currentVersion(spark, root).get
    val q2 = start()
    val e = intercept[Exception] {
      try { mem.addData((2L, "bad", -5L)); q2.processAllAvailable() }
      finally q2.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      String.valueOf(t.getMessage).contains("score_pos")),
      s"the stream failure must name the constraint: $e")
    assert(ManifestTable.currentVersion(spark, root).contains(v0),
      "a violating micro-batch must not commit")
    assert(state(root) == Set(Seq(1L, "a", 10L)))
  }

  test("restart replays the uncommitted batch exactly once") {
    val root = freshDir("sink_restart")
    val ckpt = freshDir("sink_restart_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    def start() = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "4")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try { mem.addData((1L, "a", 10L)); q1.processAllAvailable() }
    finally q1.stop()
    val v1 = ManifestTable.currentVersion(spark, root).get

    val q2 = start()
    try { mem.addData((2L, "b", 20L)); q2.processAllAvailable() }
    finally q2.stop()
    assert(state(root) == Set(Seq(1L, "a", 10L), Seq(2L, "b", 20L)))
    // exactly one more committed version — the restart neither replayed
    // batch 0 nor skipped batch 1
    assert(ManifestTable.currentVersion(spark, root).get == v1 + 1)
  }

  test("definition-time misuse refuses: Complete mode, partitionBy, no root") {
    val mem = MemoryStream[(Long, String, Long)]
    val df = mem.toDF().toDF("id", "name", "score")

    // Complete mode: the v2 write builder deliberately implements no
    // truncate(), so the ENGINE refuses — on the stream thread, which
    // surfaces on the first synchronization point after start()
    val qc = df.groupBy("id").count().writeStream.format(sinkFormat)
      .outputMode("complete")
      .option("root", freshDir("sink_refuse"))
      .option("checkpointLocation", freshDir("sink_refuse_ckpt"))
      .start()
    val e1 = intercept[Exception] {
      try { mem.addData((1L, "x", 1L)); qc.processAllAvailable() }
      finally qc.stop()
    }
    assert(e1.getMessage.contains("Complete"),
      s"expected the Complete-mode refusal, got: ${e1.getMessage}")

    // (the v2 DataStreamWriter never hands partitionBy to a table
    // provider — it is dropped before getTable — so the sink's
    // partitioning refusal is only reachable through catalog DDL;
    // definition-time option validation is what remains assertable)
    val e2 = intercept[Exception] {
      df.writeStream.format(sinkFormat)
        .option("root", freshDir("sink_refuse2"))
        .option("mode", "bogus")
        .option("checkpointLocation", freshDir("sink_refuse2_ckpt"))
        .start()
    }
    assert(e2.getMessage.contains("unknown mode"))

    val e3 = intercept[Exception] {
      df.writeStream.format(sinkFormat)
        .option("checkpointLocation", freshDir("sink_refuse3_ckpt"))
        .start()
    }
    assert(e3.getMessage.contains("root"))
  }

  test("delta mode with periodic compaction bounds per-bucket files") {
    val root = freshDir("sink_delta")
    val ckpt = freshDir("sink_delta_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "2")
      .option("delta", "true").option("compactEvery", "2")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // 4 batches over the same hot key + one moving key
      (0 until 4).foreach { i =>
        mem.addData((1L, s"v$i", i.toLong), (10L + i, "n", i.toLong))
        q.processAllAvailable()
      }
      assert(state(root) == Set(
        Seq(1L, "v3", 3L), Seq(10L, "n", 0L), Seq(11L, "n", 1L),
        Seq(12L, "n", 2L), Seq(13L, "n", 3L)))
      // compaction ran: no bucket carries more than compactEvery+1 files
      val m = ManifestTable.currentManifest(spark, root).get
      val worst = m.entries.groupBy(_.bucket).values.map(_.size).max
      assert(worst <= 3, s"bucket carries $worst live files")
    } finally q.stop()
  }

  test("delta-mode deleteWhen writes TOMBSTONES: no bucket rewrite, " +
      "state exact, compaction folds them") {
    val root = freshDir("sink_tomb")
    val ckpt = freshDir("sink_tomb_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "2")
      .option("delta", "true").option("compactEvery", "3")
      .option("deleteWhen", "score < 0")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L to 20L).map(i => (i, s"n$i", i)): _*)
      q.processAllAvailable()
      val m0 = ManifestTable.currentManifest(spark, root).get
      // batch 1: three deletes — the LSM sink must tombstone them,
      // keeping every batch-0 file live
      mem.addData((3L, "x", -1L), (7L, "x", -1L), (19L, "x", -1L))
      q.processAllAvailable()
      val m1 = ManifestTable.currentManifest(spark, root).get
      assert(m1.entries.exists(_.tomb),
        "delta-mode deleteWhen must write tombstone entries")
      m0.entries.foreach(e => assert(m1.entries.contains(e),
        s"tombstoned delete must keep prior files live: $e"))
      assert(ManifestTable.read(spark, root)
        .select("id").as[Long].collect().toSet ==
        (1L to 20L).toSet -- Set(3L, 7L, 19L))
      // batch 2 then batch 3 trigger compactEvery=3: tombstones fold
      mem.addData((21L, "n", 21L))
      q.processAllAvailable()
      mem.addData((22L, "n", 22L))
      q.processAllAvailable()
      val mc = ManifestTable.currentManifest(spark, root).get
      assert(mc.entries.forall(!_.tomb),
        s"compaction must fold sink tombstones: ${mc.entries}")
      assert(ManifestTable.read(spark, root)
        .select("id").as[Long].collect().toSet ==
        (1L to 22L).toSet -- Set(3L, 7L, 19L))
    } finally q.stop()
  }

  test("deleteWhen past maxDriverKeys: the chunked path runs (multiple " +
      "delete commits, final token = batchId), state exact") {
    val root = freshDir("sink_del_chunk")
    val ckpt = freshDir("sink_del_chunk_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "4")
      .option("deleteWhen", "score < 0")
      .option("maxDriverKeys", "10")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L to 40L).map(i => (i, s"n$i", i)): _*)
      q.processAllAvailable()
      val vSeed = ManifestTable.currentVersion(spark, root).get
      // catch-up-shaped batch: 25 deletes (> cap) + one upsert
      mem.addData(
        ((1L to 25L).map(i => (i, s"n$i", -1L)) :+
          ((41L, "x", 41L))): _*)
      q.processAllAvailable()
      assert(ManifestTable.read(spark, root)
        .select("id").as[Long].collect().toSet == (26L to 41L).toSet)
      // the collect path commits ONE delete; the chunked path at cap 10
      // over 25 keys commits ≥ 3 — version arithmetic proves which ran
      val vEnd = ManifestTable.currentVersion(spark, root).get
      assert(vEnd - vSeed >= 4,
        s"expected merge + >=3 chunk deletes, got ${vEnd - vSeed} commits")
      // the FINAL chunk commits under batchId itself, so the replay
      // signature is exactly the single-delete path's
      val m = ManifestTable.currentManifest(spark, root).get
      val delTok = m.lastBatches.collectFirst {
        case (s, t) if s.endsWith("#delete") => t }
      assert(delTok.contains(1L), s"delete ledger: ${m.lastBatches}")
    } finally q.stop()
  }

  test("a DECLARED sink table keeps zone sidecars fresh across " +
      "micro-batches: no explicit build anywhere, lookups prune exact") {
    val root = freshDir("sink_maintain")
    val ckpt = freshDir("sink_maintain_ckpt")
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", root).option("key", "id").option("numBuckets", "4")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L to 500L).map(i => (i, s"n$i", i * 10)): _*)
      q.processAllAvailable()
      // declare once, mid-stream — every later batch commit refreshes
      ManifestTable.autoMaintain(spark, root, zones = Seq("score"))
      mem.addData((501L to 600L).map(i => (i, s"n$i", i * 10)): _*)
      q.processAllAvailable()
      mem.addData((601L to 700L).map(i => (i, s"n$i", i * 10)): _*)
      q.processAllAvailable()
      val s3 = StructType(Seq(StructField("id", LongType),
        StructField("name", StringType), StructField("score", LongType)))
      val hit = graft.store.ZoneSkip.lookupRange(spark, root, s3,
        "score", 6500L, 7000L)
      assert(hit.collect().map(_.getLong(0)).sorted.toSeq ==
        (650L to 700L).toSeq,
        "zones must cover the files later batches wrote")
    } finally q.stop()
  }

  test("CDC follower propagates deletes and nets mixed batches") {
    val baseRoot = freshDir("sink_del_base")
    val derivedRoot = freshDir("sink_del_derived")
    val ckpt = freshDir("sink_del_ckpt")

    val mem = MemoryStream[(Long, String, Long)]
    val qb = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", baseRoot).option("key", "id").option("numBuckets", "4")
      .option("checkpointLocation", freshDir("sink_del_base_ckpt"))
      .start()
    try {
      mem.addData((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      qb.processAllAvailable()
    } finally qb.stop()

    // the COMPLETE declarative follower: keep the CDC columns through
    // the sink (versionColumn nets per key, deleteWhen routes deletes,
    // dropColumns keeps them out of the table) — no foreachBatch.
    def runFollower(): Unit = {
      val q = CdcSource.readStream(spark, baseRoot,
          Map("startingVersion" -> "earliest"))
        .filter(col("_change_type") =!= "update_preimage")
        .writeStream.format(sinkFormat)
        .option("root", derivedRoot).option("key", "id")
        .option("numBuckets", "4")
        .option("versionColumn", "_version")
        .option("deleteWhen", "_change_type = 'delete'")
        .option("dropColumns", "_change_type,_version")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runFollower()
    assert(state(derivedRoot) == Set(
      Seq(1L, "a", 10L), Seq(2L, "b", 20L), Seq(3L, "c", 30L)))

    // while the follower is down: delete 2, REINSERT 2 (later commit),
    // delete 3, update 1 — one catch-up batch must net per key
    val schema3 = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", LongType)))
    ManifestTable.delete(spark, baseRoot, schema3, "id", Seq(2L), token = 11L)
    val mem2 = MemoryStream[(Long, String, Long)]
    val qb2 = mem2.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", baseRoot).option("key", "id")
      .option("checkpointLocation", freshDir("sink_del_base_ckpt2"))
      .start()
    try {
      mem2.addData((2L, "b-back", 22L), (1L, "a2", 11L))
      qb2.processAllAvailable()
    } finally qb2.stop()
    ManifestTable.delete(spark, baseRoot, schema3, "id", Seq(3L), token = 12L)

    runFollower()
    val wantState = Set[Seq[Any]](Seq(1L, "a2", 11L), Seq(2L, "b-back", 22L))
    assert(state(derivedRoot) == wantState)
    assert(state(baseRoot) == wantState, "follower must mirror the base")

    // idempotent catch-up: nothing new → nothing changes
    val vBefore = ManifestTable.currentVersion(spark, derivedRoot)
    runFollower()
    assert(state(derivedRoot) == wantState)
    assert(ManifestTable.currentVersion(spark, derivedRoot) == vBefore)
  }

  test("streaming aggregate materializes into a manifest table (update mode)") {
    val root = freshDir("sink_agg")
    val ckpt = freshDir("sink_agg_ckpt")
    val mem = MemoryStream[(String, Long)]
    // update-mode aggregation: each micro-batch emits only CHANGED
    // groups; the sink upserts them — a continuously maintained
    // aggregate table with per-batch cost ∝ changed groups
    val q = mem.toDF().toDF("grp", "x")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
      .writeStream.format(sinkFormat)
      .outputMode("update")
      .option("root", root).option("key", "grp").option("numBuckets", "4")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
      q.processAllAvailable()
      assert(state(root) == Set(Seq("a", 2L, 3L), Seq("b", 1L, 10L)))

      mem.addData(("b", 5L), ("c", 7L))
      q.processAllAvailable()
      assert(state(root) == Set(
        Seq("a", 2L, 3L), Seq("b", 2L, 15L), Seq("c", 1L, 7L)))
    } finally q.stop()
  }

  test("declarative pipeline: CDC source -> transform -> table sink") {
    val baseRoot = freshDir("sink_pipe_base")
    val derivedRoot = freshDir("sink_pipe_derived")
    val ckpt = freshDir("sink_pipe_ckpt")

    // base table via the typed sink itself (bootstrap)
    val mem = MemoryStream[(Long, String, Long)]
    val qb = mem.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", baseRoot).option("key", "id").option("numBuckets", "4")
      .option("checkpointLocation", freshDir("sink_pipe_base_ckpt"))
      .start()
    try { mem.addData((1L, "a", 10L), (2L, "b", 20L)); qb.processAllAvailable() }
    finally qb.stop()

    // the follower: net row images of the feed, uppercased, no
    // foreachBatch anywhere — readStream → select/filter → writeStream.
    // (Delete propagation needs foreachBatch + ManifestTable.delete; the
    // sink upserts.)
    def runFollower(): Unit = {
      val q = CdcSource.readStream(spark, baseRoot,
          Map("startingVersion" -> "earliest"))
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .select(col("id"), upper(col("name")).as("name"), col("score"))
        .writeStream.format(sinkFormat)
        .option("root", derivedRoot).option("key", "id")
        .option("numBuckets", "4")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runFollower()
    assert(state(derivedRoot) == Set(Seq(1L, "A", 10L), Seq(2L, "B", 20L)))

    // more base commits while the follower is down; rerun catches up
    val mem2 = MemoryStream[(Long, String, Long)]
    val qb2 = mem2.toDF().toDF("id", "name", "score")
      .writeStream.format(sinkFormat)
      .option("root", baseRoot).option("key", "id")
      .option("checkpointLocation", freshDir("sink_pipe_base_ckpt2"))
      .start()
    try { mem2.addData((2L, "b2", 22L), (3L, "c", 30L)); qb2.processAllAvailable() }
    finally qb2.stop()

    runFollower()
    assert(state(derivedRoot) == Set(
      Seq(1L, "A", 10L), Seq(2L, "B2", 22L), Seq(3L, "C", 30L)))
  }
}
