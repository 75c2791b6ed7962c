package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA =
    "the quick brown fox jumps over the lazy dog near the river bank"
  private val docANear =
    "the quick brown fox jumps over the lazy dog near the river bend"
  private val docB =
    "completely different text about spark query engines and shuffles"
  private val docC =
    "yet another unrelated document discussing distributed aggregation"

  private def df(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def freshRoots(name: String): (String, String) = {
    val idx = s"target/test-tmp/$name/index"
    val prs = s"target/test-tmp/$name/pairs"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"target/test-tmp/$name"))
    (idx, prs)
  }

  private def pairsOf(prs: String, batch: Long): Set[(Long, Long)] =
    spark.read.parquet(s"$prs/p$batch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("arriving near-dups match ALL earlier batches, index grows") {
    val (idx, prs) = freshRoots("sdedup_flow")
    StreamingDedup.applyBatch(df(1L -> docA, 2L -> docB), 0L, idx, prs)
    assert(pairsOf(prs, 0L).isEmpty) // nothing indexed before batch 0
    StreamingDedup.applyBatch(df(3L -> docC), 1L, idx, prs)
    assert(pairsOf(prs, 1L).isEmpty)
    // batch 2 near-dups doc 1 (indexed two batches ago)
    StreamingDedup.applyBatch(df(4L -> docANear, 5L -> docA), 2L, idx, prs)
    val p2 = pairsOf(prs, 2L)
    assert(p2.contains((4L, 1L)) && p2.contains((5L, 1L)),
      s"missed cross-batch near-dups: $p2")
    assert(!p2.exists(_._2 == 2L) && !p2.exists(_._2 == 3L),
      s"false positives vs distinct docs: $p2")
    assert(StreamingDedup.committedDeltas(spark, idx).length == 3)
  }

  test("near-dups arriving in the SAME batch are paired") {
    val (idx, prs) = freshRoots("sdedup_within")
    StreamingDedup.applyBatch(df(1L -> docB), 0L, idx, prs)
    // docs 2 and 3 are near-dups of each other and arrive together
    StreamingDedup.applyBatch(df(2L -> docA, 3L -> docANear), 1L, idx, prs)
    val p1 = pairsOf(prs, 1L)
    assert(p1.contains((3L, 2L)), s"within-batch pair missed: $p1")
  }

  test("compaction bounds the delta count, detection still works") {
    val (idx, prs) = freshRoots("sdedup_compact")
    StreamingDedup.applyBatch(df(1L -> docA), 0L, idx, prs,
      compactEvery = 2)
    StreamingDedup.applyBatch(df(2L -> docB), 1L, idx, prs,
      compactEvery = 2)
    // third delta would exceed the bound → compacts to ONE dir
    StreamingDedup.applyBatch(df(3L -> docC), 2L, idx, prs,
      compactEvery = 2)
    assert(StreamingDedup.committedDeltas(spark, idx).length == 1)
    // post-compaction arrivals still match pre-compaction docs
    StreamingDedup.applyBatch(df(4L -> docANear), 3L, idx, prs,
      compactEvery = 2)
    assert(pairsOf(prs, 3L) == Set((4L, 1L)))
    assert(StreamingDedup.readIndex(spark, idx)
      .select("doc_id").distinct().count() == 4)
  }

  test("replay of a fully published batch is a no-op") {
    val (idx, prs) = freshRoots("sdedup_replay")
    StreamingDedup.applyBatch(df(1L -> docA), 0L, idx, prs)
    StreamingDedup.applyBatch(df(2L -> docANear), 1L, idx, prs)
    val before = pairsOf(prs, 1L)
    assert(before == Set((2L, 1L)))
    StreamingDedup.applyBatch(df(2L -> docANear), 1L, idx, prs) // replay
    assert(pairsOf(prs, 1L) == before)
    assert(StreamingDedup.committedDeltas(spark, idx).length == 2)
  }

  test("comparison join broadcasts the batch, never shuffles the index") {
    val (idx, prs) = freshRoots("sdedup_plan")
    StreamingDedup.applyBatch(df(1L -> docA), 0L, idx, prs)
    val prior = StreamingDedup.readIndex(spark, idx)
      .withColumnRenamed("doc_id", "matched_id")
    val batchIdx = graft.operators.Dedup.bandIndex(df(9L -> docANear))
    val plan = prior
      .join(org.apache.spark.sql.functions.broadcast(batchIdx),
        Seq("band", "bh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"index would be shuffled per batch:\n$plan")
  }

  test("size-tiered compaction never rewrites the mature large run") {
    val (idx, prs) = freshRoots("sdedup_tiered")
    // batch 0: a LARGE run (50 docs); later batches are single docs
    val big = (1L to 50L).map(i =>
      i -> s"document number $i about topic ${i % 7} with unique tail $i")
    StreamingDedup.applyBatch(df(big: _*), 0L, idx, prs, compactEvery = 3)
    def digests(d: String): Map[String, Long] = {
      val base = java.nio.file.Paths.get(d)
      val s = java.nio.file.Files.walk(base)
      try s.filter(java.nio.file.Files.isRegularFile(_)).toArray.map { p0 =>
        val p = p0.asInstanceOf[java.nio.file.Path]
        base.relativize(p).toString -> java.nio.file.Files.size(p)
      }.toMap
      finally s.close()
    }
    val d0Before = digests(s"$idx/d0")
    StreamingDedup.applyBatch(df(100L -> docB), 1L, idx, prs,
      compactEvery = 3)
    StreamingDedup.applyBatch(df(101L -> docC), 2L, idx, prs,
      compactEvery = 3)
    // 3 priors + batch > 3 → compaction merges the two SMALLEST runs
    // (d1, d2) with the batch; the large d0 must not be rewritten
    StreamingDedup.applyBatch(df(102L -> docA), 3L, idx, prs,
      compactEvery = 3)
    val deltas = StreamingDedup.committedDeltas(spark, idx)
    assert(deltas.exists(_.endsWith("/d0")),
      s"large run was merged away: $deltas")
    assert(digests(s"$idx/d0") == d0Before,
      "mature large run rewritten by compaction")
    assert(deltas.length == 2, s"tier count must shrink: $deltas")
    // detection across tiers still works: a near-dup of a batch-0 doc
    StreamingDedup.applyBatch(
      df(200L -> "document number 7 about topic 0 with unique tail 7x"),
      4L, idx, prs, compactEvery = 3)
    assert(pairsOf(prs, 4L).contains((200L, 7L)),
      s"cross-tier match missed: ${pairsOf(prs, 4L)}")
  }

  test("crashed compaction (tombstone committed, sources undeleted) " +
      "never double-counts") {
    val (idx, prs) = freshRoots("sdedup_crash_compact")
    // three committed runs
    StreamingDedup.applyBatch(df(1L -> docA), 0L, idx, prs)
    StreamingDedup.applyBatch(df(2L -> docB), 1L, idx, prs)
    StreamingDedup.applyBatch(df(3L -> docC), 2L, idx, prs)
    val rowsBefore = StreamingDedup.readIndex(spark, idx).count()
    // simulate the crash window: d2's tombstone says it superseded d0
    // and d1 (as a compaction would), but the source dirs were never
    // physically deleted
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idx/d2/_MERGED"), "d0\nd1\n")
    // the superseded runs are logically dead: excluded from the listing
    val live = StreamingDedup.committedDeltas(spark, idx)
    assert(live.map(_.split('/').last) == Seq("d2"),
      s"superseded runs must not be listed: $live")
    // ...so the index reads without double-counting (d2 here doesn't
    // actually contain d0/d1's rows — the point is the leftovers are
    // invisible, not unioned in twice)
    assert(StreamingDedup.readIndex(spark, idx).count() < rowsBefore)
    // the next batch's janitor sweeps the leftovers off disk
    StreamingDedup.applyBatch(df(4L -> docB), 3L, idx, prs)
    assert(!new java.io.File(s"$idx/d0").exists())
    assert(!new java.io.File(s"$idx/d1").exists())
    // and the replay guard still honors superseded names: a replay of a
    // batch whose run was compacted away stays a no-op
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$idx/d3/_MERGED"), "d2\n")
    StreamingDedup.applyBatch(df(99L -> docA), 2L, idx, prs)
    assert(!new java.io.File(s"$idx/.tmp-d2").exists())
    assert(StreamingDedup.readIndex(spark, idx)
      .filter($"doc_id" === 99L).count() == 0,
      "replay of a superseded batch must not re-publish")
  }

  test("stray dir named exactly 'd' does not break delta listing") {
    val (idx, prs) = freshRoots("sdedup_straydir")
    StreamingDedup.applyBatch(df(1L -> docA), 0L, idx, prs)
    // a directory whose name is just "d" has an EMPTY numeric suffix;
    // it must be filtered out, not crash the sort with "".toLong
    new java.io.File(s"$idx/d").mkdirs()
    new java.io.File(s"$idx/d/_SUCCESS").createNewFile()
    assert(StreamingDedup.committedDeltas(spark, idx)
      .forall(_.endsWith("/d0")))
    // subsequent batches keep working
    StreamingDedup.applyBatch(df(2L -> docANear), 1L, idx, prs)
    assert(pairsOf(prs, 1L) == Set((2L, 1L)))
  }

  test("end-to-end over a MemoryStream") {
    val (idx, prs) = freshRoots("sdedup_e2e")
    val ckpt = s"target/test-tmp/sdedup_e2e/ckpt"
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    mem.addData((1L, docA), (2L, docB))
    StreamingDedup.start(stream, idx, prs, ckpt).awaitTermination()
    mem.addData((3L, docANear))
    StreamingDedup.start(stream, idx, prs, ckpt).awaitTermination()
    assert(pairsOf(prs, 1L) == Set((3L, 1L)))
  }

  test("an index root is bound to ONE checkpoint incarnation: a " +
      "different incarnation refuses loudly instead of silently " +
      "skipping batches whose ids collide with the old ledger") {
    val idx = "target/test-tmp/sd_owner_idx"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    StreamingDedup.ensureOwner(spark, idx, "incarnation-A")
    // same incarnation re-binds freely (every micro-batch re-checks)
    StreamingDedup.ensureOwner(spark, idx, "incarnation-A")
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.ensureOwner(spark, idx, "incarnation-B")
    }
    assert(e.getMessage.contains("incarnation"), e.getMessage)
    assert(e.getMessage.toLowerCase.contains("fresh indexroot"),
      e.getMessage)
  }
}
