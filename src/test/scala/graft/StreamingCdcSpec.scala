package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable
import graft.streaming.CdcSource

/** The manifest table's change feed as a first-class Structured Streaming
  * source: offsets are manifest versions, each micro-batch IS
  * `ManifestTable.changes` for its offset range, checkpointed restart
  * resumes without loss or duplication, and admission control bounds how
  * many commits one batch may span. */
class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType)))

  private def mapping = {
    val m = new Mapping()
    m.auto("id"); m.auto("name"); m.auto("score")
    m.complete(schema)
    m
  }

  private def raw(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex
      .map { case ((id, n, s), i) => (Seq(id.toString, n, s), i.toLong) }
      .toDF("_raw", "_line")

  private def freshDir(name: String): String = {
    val dir = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  private def mergeRows(root: String, batchId: Long,
      rows: (Long, String, String)*): Unit =
    ManifestTable.merge(mapping.project(raw(rows: _*)), batchId, mapping,
      root, schema, numBuckets = 4)

  /** Runs one stream over the table, collecting (batchId, rows) per
    * non-empty micro-batch, until no offsets remain; returns the batches. */
  private def runStream(
      root: String, ckpt: String,
      options: Map[String, String] = Map.empty)
      : Seq[(Long, Seq[Row])] = {
    val batches = ArrayBuffer[(Long, Seq[Row])]()
    val q = CdcSource.readStream(spark, root, schema, options)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
        val rows = df.collect().toSeq
        batches.synchronized { batches += ((id, rows)) }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    batches.toSeq.filter(_._2.nonEmpty)
  }

  private def sortedRows(rows: Seq[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq.toList).sortBy(_.mkString("|"))

  test("earliest stream replays the full history and matches the batch feed") {
    val root = freshDir("cdc_earliest")
    val ckpt = freshDir("cdc_earliest_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"), (2L, "b", "20"), (3L, "c", "30"))
    mergeRows(root, 1L, (2L, "B", "20"), (4L, "d", "40"))
    ManifestTable.delete(spark, root, schema, "id", Seq(1L), token = 99L)

    val got = runStream(root, ckpt,
      Map("startingVersion" -> "earliest")).flatMap(_._2)
    val want = ManifestTable.changes(spark, root, schema, "id", -1L, 2L)
      .collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
    // the feed shape survived the stream: v0 inserts, v1 update pre+post
    // and insert, v2 delete
    val byType = got.groupBy(_.getAs[String]("_change_type"))
      .view.mapValues(_.size).toMap
    assert(byType == Map(
      "insert" -> 4, "update_preimage" -> 1, "update_postimage" -> 1,
      "delete" -> 1))
  }

  test("default latest start emits nothing until the next commit") {
    val root = freshDir("cdc_latest")
    val ckpt = freshDir("cdc_latest_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"), (2L, "b", "20"))

    assert(runStream(root, ckpt).isEmpty, "history must not replay")

    mergeRows(root, 1L, (1L, "A", "11"), (3L, "c", "30"))
    val got = runStream(root, ckpt).flatMap(_._2)
    val want = ManifestTable.changes(spark, root, schema, "id", 0L, 1L)
      .collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
    assert(got.forall(_.getAs[Long]("_version") == 1L))
  }

  test("checkpointed restart resumes exactly after the last batch") {
    val root = freshDir("cdc_restart")
    val ckpt = freshDir("cdc_restart_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"))
    val first = runStream(root, ckpt, Map("startingVersion" -> "earliest"))
    assert(first.flatMap(_._2).map(_.getAs[Long]("_version")).toSet == Set(0L))

    // two commits while the stream is down; the restarted query must emit
    // exactly their changes — no replay of v0, no skipped version
    mergeRows(root, 1L, (2L, "b", "20"))
    mergeRows(root, 2L, (1L, "A2", "12"))
    val resumed = runStream(root, ckpt, Map("startingVersion" -> "earliest"))
    val got = resumed.flatMap(_._2)
    val want = ManifestTable.changes(spark, root, schema, "id", 0L, 2L)
      .collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
    assert(got.map(_.getAs[Long]("_version")).toSet == Set(1L, 2L))
  }

  test("maxVersionsPerBatch paces a backlog one commit per micro-batch") {
    val root = freshDir("cdc_paced")
    val ckpt = freshDir("cdc_paced_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"))
    mergeRows(root, 1L, (2L, "b", "20"))
    mergeRows(root, 2L, (3L, "c", "30"))

    val batches = runStream(root, ckpt,
      Map("startingVersion" -> "earliest", "maxVersionsPerBatch" -> "1"))
    // 3 commits → 3 non-empty micro-batches, each spanning ONE version
    assert(batches.size == 3, s"expected 3 paced batches, got $batches")
    val versionsPerBatch = batches.map(_._2
      .map(_.getAs[Long]("_version")).distinct)
    assert(versionsPerBatch == Seq(Seq(0L), Seq(1L), Seq(2L)))
  }

  test("stream over a delta-merge table sees reconciled changes") {
    val root = freshDir("cdc_delta")
    val ckpt = freshDir("cdc_delta_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"), (2L, "b", "20"))
    // delta merge: only the batch's rows are written; the feed must still
    // emit the reconciled update image, not raw file contents
    ManifestTable.merge(mapping.project(raw((2L, "B", "21"))), 1L, mapping,
      root, schema, delta = true)

    val got = runStream(root, ckpt,
      Map("startingVersion" -> "1")).flatMap(_._2)
    val want = ManifestTable.changes(spark, root, schema, "id", 0L, 1L)
      .collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
    assert(got.map(_.getAs[String]("_change_type")).sorted ==
      Seq("update_postimage", "update_preimage"))
  }

  test("option and schema misuse fail loudly") {
    val root = freshDir("cdc_errs")
    mergeRows(root, 0L, (1L, "a", "10"))

    // missing .schema(...) AND no manifest to infer from (the fixture
    // table is format 7 and self-describes — SchemaEvolutionSpec pins
    // that inference; a table with no manifest cannot)
    val e1 = intercept[Exception] {
      spark.readStream
        .format(classOf[graft.streaming.CdcSourceProvider].getName)
        .option("root", freshDir("cdc_errs_missing")).load()
    }
    assert(e1.getMessage.contains("schema"))

    // reserved CDC column in the table schema
    val bad = StructType(schema.fields :+ StructField("_version", LongType))
    val e2 = intercept[Exception] {
      CdcSource.readStream(spark, root, bad)
    }
    assert(e2.getMessage.contains("_version"))

    // junk startingVersion surfaces at stream start — a non-numeric
    // value is a TAG name since r13b, so the failure is the tag
    // lookup's (listing the live tags), still loud and still at start
    val ckpt = freshDir("cdc_errs_ckpt")
    val e3 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = CdcSource.readStream(spark, root, schema,
        Map("startingVersion" -> "yesterday"))
        .writeStream.format("noop").option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain3(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain3(t.getCause)
    assert(chain3(e3).exists(t =>
      String.valueOf(t.getMessage).contains("no tag 'yesterday'")),
      s"junk start must fail as a tag lookup: ${e3.getMessage}")
  }

  test("startingVersion by TAG: the stream begins at the pinned " +
      "corpus cut") {
    val root = freshDir("cdc_tag")
    val ckpt = freshDir("cdc_tag_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"), (2L, "b", "20"))
    ManifestTable.tag(spark, root, "cut")
    mergeRows(root, 1L, (3L, "c", "30"))
    mergeRows(root, 2L, (2L, "B", "21"))
    // start AT the tag: everything the cut itself contains is history;
    // the stream emits the commits from the cut's version onward —
    // same contract as a numeric start at that version
    val tagged = ManifestTable.tagsOf(spark, root)("cut")
    val got = runStream(root, ckpt,
      Map("startingVersion" -> "cut")).flatMap(_._2)
    val want = ManifestTable.changes(spark, root, schema, "id",
      tagged - 1L, tagged + 2L).collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
  }

  test("Trigger.AvailableNow drains the backlog and terminates") {
    val root = freshDir("cdc_availnow")
    val ckpt = freshDir("cdc_availnow_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"))
    mergeRows(root, 1L, (2L, "b", "20"))

    val batches = ArrayBuffer[Row]()
    def runOnce(): Unit = {
      val q = CdcSource.readStream(spark, root,
          Map("startingVersion" -> "earliest"))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          batches.synchronized { batches ++= df.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    }
    runOnce()
    assert(batches.map(_.getAs[Long]("_version")).toSet == Set(0L, 1L))

    // the catch-up-job pattern: new commits, re-run, only the delta
    batches.clear()
    mergeRows(root, 2L, (3L, "c", "30"))
    runOnce()
    assert(batches.map(_.getAs[Long]("_version")).toSet == Set(2L))
  }

  test("maxRowsPerBatch paces a backlog by added rows; an oversized " +
      "commit still advances") {
    val root = freshDir("cdc_maxrows")
    // every commit adds >= 1 row, so a 1-row cap admits EXACTLY one
    // commit per batch (each is oversized and advances atomically) —
    // deterministic whatever bucket carryover the merges rewrite
    mergeRows(root, 0L, (1L to 5L).map(i => (i, s"a$i", "1")): _*)
    mergeRows(root, 1L, (11L to 15L).map(i => (i, s"b$i", "2")): _*)
    mergeRows(root, 2L, (21L to 32L).map(i => (i, s"c$i", "3")): _*)

    def run(cap: String, ckpt: String): Seq[Set[Long]] = {
      val perBatch = ArrayBuffer[Set[Long]]()
      val q = CdcSource.readStream(spark, root,
          Map("startingVersion" -> "earliest", "maxRowsPerBatch" -> cap))
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          val vs = df.collect().map(_.getAs[Long]("_version")).toSet
          perBatch.synchronized { if (vs.nonEmpty) perBatch += vs }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not terminate")
      perBatch.toSeq
    }
    assert(run("1", freshDir("cdc_maxrows_ckpt1")) ==
      Seq(Set(0L), Set(1L), Set(2L)))
    // a huge cap drains everything in one batch
    assert(run("1000000", freshDir("cdc_maxrows_ckpt2")) ==
      Seq(Set(0L, 1L, 2L)))
  }

  test("AvailableNow fences its end version at prepare time: a commit " +
      "landing MID-RUN waits for the next invocation") {
    val root = freshDir("cdc_availnow_fence")
    val ckpt = freshDir("cdc_availnow_fence_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"))
    mergeRows(root, 1L, (2L, "b", "20"))

    val seen = ArrayBuffer[Long]()
    val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOnce(): Unit = {
      val q = CdcSource.readStream(spark, root,
          Map("startingVersion" -> "earliest",
            "maxVersionsPerBatch" -> "1")) // paced: >1 micro-batch
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
          seen.synchronized {
            seen ++= df.collect().map(_.getAs[Long]("_version"))
          }
          // first batch of the first run: land a NEW commit mid-run —
          // the fence must keep it out of THIS run
          if (injected.compareAndSet(false, true))
            mergeRows(root, 2L, (3L, "c", "30"))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    }
    runOnce()
    assert(seen.toSet == Set(0L, 1L),
      s"mid-run commit leaked into the fenced run: $seen")
    seen.clear()
    runOnce() // next invocation picks up exactly the injected commit
    assert(seen.toSet == Set(2L))
  }

  test("a stream lagging behind vacuum fails loudly, never skips commits") {
    val root = freshDir("cdc_vacuumed")
    val ckpt = freshDir("cdc_vacuumed_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"))
    val first = runStream(root, ckpt, Map("startingVersion" -> "earliest"))
    assert(first.nonEmpty)

    // 3 commits while down, then vacuum to keepLast=1: the feed for the
    // backlog needs manifests the vacuum dropped — the stream must FAIL,
    // not silently resume from the surviving head
    mergeRows(root, 1L, (2L, "b", "20"))
    mergeRows(root, 2L, (3L, "c", "30"))
    mergeRows(root, 3L, (4L, "d", "40"))
    ManifestTable.vacuum(spark, root, keepLast = 1)

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = CdcSource.readStream(spark, root, schema)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("manifest") || m.contains("m1")),
      s"unexpected failure chain: ${msgs(e)}")
  }

  test("foreachBatch follower keeps a derived manifest table exactly-once") {
    val root = freshDir("cdc_follower_base")
    val viewRoot = freshDir("cdc_follower_view")
    val ckpt = freshDir("cdc_follower_ckpt")
    mergeRows(root, 0L, (1L, "a", "10"), (2L, "b", "20"))

    // the follower: every CDC micro-batch merges net row images into a
    // downstream manifest table, idempotent via the table's replay ledger
    // keyed by the STREAM's batchId
    def startFollower() = {
      val vm = mapping
      CdcSource.readStream(spark, root, schema,
          Map("startingVersion" -> "earliest"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], id: Long) =>
          val s = df.sparkSession
          import org.apache.spark.sql.functions._
          val net = df.filter(col("_change_type")
              .isin("insert", "update_postimage"))
            .select("id", "name", "score")
          if (!net.isEmpty) {
            val projected = vm.project(
              net.select(array(col("id").cast("string"), col("name"),
                col("score").cast("string")).as("_raw"),
                monotonically_increasing_id().as("_line")))
            ManifestTable.merge(projected, id, vm, viewRoot, schema,
              numBuckets = 4, streamId = "cdc-follower")
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
    }

    val q1 = startFollower()
    try q1.processAllAvailable() finally q1.stop()
    mergeRows(root, 1L, (2L, "B", "21"), (3L, "c", "30"))
    val q2 = startFollower()
    try q2.processAllAvailable() finally q2.stop()

    val got = ManifestTable.read(spark, viewRoot, schema)
      .collect().toSeq
    val want = ManifestTable.read(spark, root, schema).collect().toSeq
    assert(sortedRows(got) == sortedRows(want))
  }

  test("blob stage serves only the winner manifest's files — a zombie " +
      "attempt's blob landing in the committed dir is never read") {
    import graft.streaming.RowBlobStage
    val dir = "target/test-tmp/cdc_blobstage/d0"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("target/test-tmp/cdc_blobstage"))
    val df = (1L to 40L).map(i => (i, s"n$i")).toDF("id", "name")
    RowBlobStage.stage(spark, df, dir)
    val files = RowBlobStage.stagedFiles(spark, dir)
    assert(files.nonEmpty)
    // a zombie task attempt recreates its loser blob AFTER the shed
    // pass but BEFORE/AFTER the rename: simulate by dropping a stray
    // part-* file into the committed dir — the manifest must gate it
    val stray = new org.apache.hadoop.fs.Path(dir, "part-0-a999")
    val fs = stray.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(stray, true)
    out.writeInt(-1); out.close()
    assert(RowBlobStage.stagedFiles(spark, dir).toSet == files.toSet,
      "stagedFiles must serve exactly the manifest's winner set")
    // rows still read back complete and exactly-once
    val conf = RowBlobStage.confOf(spark).value
    val n = files.map(f =>
      RowBlobStage.readRows(f, df.schema, conf).size).sum
    assert(n == 40)
  }
}
