package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable

/** Model-based property test of the manifest protocol: a seeded random
  * sequence of merges, targeted deletes, and replays (the at-least-once
  * re-delivery of the LAST batch, with corrupted payload — exactly what
  * foreachBatch can do) must leave the committed table equal to a plain
  * in-memory map after every step. Catches protocol-level bugs
  * (swallowed batches, replay double-application, delete erasing
  * bystanders) that example-based specs enumerate one at a time. The
  * op set includes TOMBSTONE deletes and ONLINE BUCKET SPLITS, so the
  * whole protocol is exercised over split trees too — and any commit
  * path that forgot to carry `Manifest.splits` forward diverges here
  * immediately (the next addressing-dependent op reads the wrong
  * leaves). r13b extends the algebra: random TAGS must hold their
  * pinned snapshot through every later commit and keepLast=1 vacuum,
  * DECLARED COMPACTION toggles on and off mid-run (the commit hook
  * folding chains under merges/deletes/splits must stay
  * row-invisible), and a mid-run SHALLOW CLONE must still read its
  * bind-time snapshot after the source churns and vacuums. */
class ManifestTablePropertySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def mapping = {
    val m = new Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    m
  }

  private def raw(rows: Seq[(Long, Long)]): DataFrame =
    rows.zipWithIndex
      .map { case ((id, v), i) => (Seq(id.toString, v.toString), i.toLong) }
      .toDF("_raw", "_line")

  test("random merge/delete/replay sequences match an in-memory model") {
    val root = "target/test-tmp/manifest_property"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val rnd = new scala.util.Random(20260812L)
    val m = mapping
    val model = mutable.Map.empty[Long, Long]
    var batchId = 0L
    var deleteToken = 1000L
    var lastMerge: Option[(Long, Seq[(Long, Long)])] = None
    var taggedSnapshot: Option[(String, Map[Long, Long])] = None
    var cloneSnapshot: Option[Map[Long, Long]] = None
    val cloneRoot = "target/test-tmp/manifest_property_clone"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(cloneRoot))
    var tagN = 0

    def check(step: String): Unit = {
      val got = ManifestTable.read(spark, root, schema)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap,
        s"diverged after $step: got=${got.toSeq.sorted} " +
          s"model=${model.toSeq.sorted}")
    }

    for (step <- 0 until 48) {
      // one mid-run shallow clone (pinned): its read must equal its
      // bind-time snapshot at the END, after everything below churns
      // and vacuums the source
      if (step == 24 &&
          ManifestTable.currentVersion(spark, root).isDefined) {
        ManifestTable.cloneAt(spark, root, cloneRoot)
        cloneSnapshot = Some(model.toMap)
      }
      rnd.nextInt(9) match {
        case 0 | 1 => // merge a random batch (intra-batch dups: last wins)
          val rows = Seq.fill(1 + rnd.nextInt(8))(
            (rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong))
          // randomly delta-mode: readers must reconcile identically
          val delta = rnd.nextBoolean()
          ManifestTable.merge(m.project(raw(rows)), batchId, m, root,
            schema, numBuckets = 4, streamId = "p", delta = delta)
          rows.foreach { case (id, v) => model(id) = v }
          lastMerge = Some((batchId, rows))
          batchId += 1
          check(s"merge#$step(delta=$delta, $rows)")
        case 2 => // replay the LAST merge with a corrupted payload
          lastMerge.foreach { case (bid, _) =>
            val garbage = Seq((rnd.nextInt(30).toLong, -999L))
            val rewritten = ManifestTable.merge(m.project(raw(garbage)),
              bid, m, root, schema, numBuckets = 4, streamId = "p")
            assert(rewritten.isEmpty, s"replay of $bid rewrote files")
          }
          check(s"replay#$step")
        case 3 => // targeted delete of a random key set — randomly in
          // TOMBSTONE mode (readers must reconcile identically)
          if (model.nonEmpty) {
            val victims = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(3))
            val delta = rnd.nextBoolean()
            ManifestTable.delete(spark, root, schema, "id", victims,
              deleteToken, delta = delta)
            victims.foreach(model.remove)
            // replayed delete with the same token: no further effect
            assert(ManifestTable.delete(spark, root, schema, "id",
              victims, deleteToken, delta = delta).isEmpty)
            deleteToken += 1
            check(s"delete#$step(delta=$delta, $victims)")
          }
        case 4 => // compact delta-carrying buckets: row-invisible
          if (ManifestTable.currentVersion(spark, root).isDefined) {
            ManifestTable.compact(spark, root, schema, "id", deleteToken)
            deleteToken += 1
            check(s"compact#$step")
          }
        case 5 => // vacuum: current state must survive GC
          ManifestTable.vacuum(spark, root)
          check(s"vacuum#$step")
        case 6 => // online split of whatever leaves a tiny threshold
          // catches (splits over splits, splits over tombstones)
          if (ManifestTable.currentVersion(spark, root).isDefined &&
              model.nonEmpty) {
            ManifestTable.splitBuckets(spark, root, schema, deleteToken,
              maxBytes = 1L + rnd.nextInt(2000))
            deleteToken += 1
            check(s"split#$step")
          }
        case 7 => // tag the current version: the pin must hold its
          // snapshot through every later commit and keepLast=1 vacuum
          if (ManifestTable.currentVersion(spark, root).isDefined) {
            taggedSnapshot.foreach { case (old, _) =>
              ManifestTable.deleteTag(spark, root, old) }
            val name = s"prop_tag_$tagN"; tagN += 1
            ManifestTable.tag(spark, root, name)
            taggedSnapshot = Some((name, model.toMap))
            check(s"tag#$step($name)")
          }
        case 8 => // toggle DECLARED COMPACTION: from here on the
          // commit hook folds over-threshold chains — row-invisible
          // under every interleaving with merges/deletes/splits
          if (ManifestTable.currentVersion(spark, root).isDefined) {
            val on = rnd.nextBoolean()
            ManifestTable.autoMaintain(spark, root,
              compactFiles = if (on) 2 else 0)
            check(s"autoCompact#$step($on)")
          }
      }
      // the standing pins hold at EVERY step, not just at the end
      taggedSnapshot.foreach { case (name, snap) =>
        val got = ManifestTable.readAt(spark, root, name)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == snap, s"tag $name diverged after step $step")
      }
    }
    cloneSnapshot.foreach { snap =>
      val got = ManifestTable.read(spark, cloneRoot, schema)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == snap,
        "the mid-run shallow clone must still read its bind-time " +
          "snapshot after the source churned and vacuumed")
    }
    assert(model.nonEmpty, "degenerate run: model ended empty")
    // the full maintained-view algebra agrees with the model too
    val cur = ManifestTable.currentVersion(spark, root).get
    // (bootstrap at the current version — pure fullAgg sanity)
    val view = graft.store.IncrementalAgg.fullAgg(
      ManifestTable.read(spark, root, schema), Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Number](2).longValue)
      .toMap
    assert(view == model.toMap, s"fullAgg diverged at v$cur")
  }
}
