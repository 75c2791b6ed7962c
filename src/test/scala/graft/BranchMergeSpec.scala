package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.ManifestTable

/** [[ManifestTable.mergeBranch]] — branch merge-back: a diverged
  * shallow clone's net edits land on its source as one idempotent
  * upsert + one bounded delete, with conflicts (keys changed on both
  * sides since the bind) refused, branch-won, or source-won. */
class BranchMergeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType)))

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private def mergeRows(root: String, batch: Long,
      rows: (Long, Long)*): Unit = {
    val m = new graft.mapping.Mapping()
    m.auto("id"); m.auto("v")
    m.complete(schema)
    val raw = rows.zipWithIndex
      .map { case ((id, v), i) => (Seq(id.toString, v.toString), i.toLong) }
      .toDF("_raw", "_line")
    ManifestTable.merge(m.project(raw), batch, m, root, schema,
      streamId = "bm-spec")
  }

  private def state(root: String): Map[Long, Long] =
    ManifestTable.read(spark, root, schema).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clean merge-back: the branch's net edits (update, insert, " +
      "delete) land on the untouched source; the token replays") {
    val src = freshRoot("bm_src")
    val dst = freshRoot("bm_dst")
    ManifestTable.create(
      (1L to 100L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst)
    // branch edits: update 5, insert 300, delete 7 — and a key edited
    // then DELETED (nets to delete), and one deleted then re-inserted
    // (nets to the re-insert)
    mergeRows(dst, 1L, (5L, 999L), (300L, 300L), (8L, 888L))
    ManifestTable.delete(spark, dst, schema, "id", Seq(7L, 8L),
      token = 1L)
    mergeRows(dst, 2L, (9L, 909L))
    ManifestTable.delete(spark, dst, schema, "id", Seq(9L), token = 2L)
    mergeRows(dst, 3L, (9L, 919L))
    val (up, del, conf) =
      ManifestTable.mergeBranch(spark, src, dst, token = 50L)
    assert(conf == 0L, "untouched source: no conflicts")
    assert(up == 3L && del == 2L, s"net actions: got ($up, $del)")
    val expect = (1L to 100L).map(i => i -> i).toMap ++
      Map(5L -> 999L, 300L -> 300L, 9L -> 919L) -- Seq(7L, 8L)
    assert(state(src) == expect)
    // replay: same token applies nothing further
    val vAfter = ManifestTable.currentVersion(spark, src).get
    ManifestTable.mergeBranch(spark, src, dst, token = 50L)
    assert(ManifestTable.currentVersion(spark, src).get == vAfter,
      "a replayed merge-back must not commit")
    assert(state(src) == expect)
  }

  test("conflicts: keys changed on both sides refuse by default, " +
      "and resolve under branch-wins / source-wins") {
    val src = freshRoot("bm_conf_src")
    ManifestTable.create(
      (1L to 50L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val d1 = freshRoot("bm_conf_d1")
    val d2 = freshRoot("bm_conf_d2")
    ManifestTable.cloneAt(spark, src, d1)
    ManifestTable.cloneAt(spark, src, d2)
    // both branches edit key 5; the SOURCE edits key 5 too
    mergeRows(d1, 1L, (5L, 111L), (301L, 301L))
    mergeRows(d2, 1L, (5L, 222L), (302L, 302L))
    mergeRows(src, 9L, (5L, 500L))
    // default: refuse loudly with the conflict
    val e = intercept[IllegalStateException] {
      ManifestTable.mergeBranch(spark, src, d1, token = 60L)
    }
    assert(e.getMessage.contains("1 key(s)") &&
      e.getMessage.contains("5"), e.getMessage)
    assert(state(src)(5L) == 500L, "a refusal commits nothing")
    assert(!state(src).contains(301L))
    // source-wins: only the clean insert lands
    val (u1, _, c1) = ManifestTable.mergeBranch(spark, src, d1,
      token = 61L, onConflict = "source")
    assert(c1 == 1L && u1 == 1L)
    assert(state(src)(5L) == 500L && state(src)(301L) == 301L)
    // branch-wins: the branch's value overwrites
    val (u2, _, c2) = ManifestTable.mergeBranch(spark, src, d2,
      token = 62L, onConflict = "branch")
    assert(c2 == 1L && u2 == 2L)
    assert(state(src)(5L) == 222L && state(src)(302L) == 302L)
  }

  test("per-branch replay ledgers: two branches merging with the SAME " +
      "token value both land (neither reads the other's token as its " +
      "own replay)") {
    val src = freshRoot("bm_tok_src")
    ManifestTable.create(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    val d1 = freshRoot("bm_tok_d1")
    val d2 = freshRoot("bm_tok_d2")
    ManifestTable.cloneAt(spark, src, d1, pin = false)
    ManifestTable.cloneAt(spark, src, d2, pin = false)
    mergeRows(d1, 1L, (401L, 401L))
    mergeRows(d2, 1L, (402L, 402L))
    assert(ManifestTable.mergeBranch(spark, src, d1, token = 7L) ==
      ((1L, 0L, 0L)))
    // the SECOND branch reuses token 7 — a shared ledger stream would
    // silently read it as a replay and drop the merge
    assert(ManifestTable.mergeBranch(spark, src, d2, token = 7L) ==
      ((1L, 0L, 0L)), "branch 2's merge must not no-op on branch 1's token")
    assert(state(src).contains(401L) && state(src).contains(402L))
    // and each branch's OWN replay still no-ops
    val v = ManifestTable.currentVersion(spark, src).get
    ManifestTable.mergeBranch(spark, src, d1, token = 7L)
    assert(ManifestTable.currentVersion(spark, src).contains(v))
  }

  test("guard rails: never-diverged branches no-op; non-clones and " +
      "wrong sources refuse") {
    val src = freshRoot("bm_guard_src")
    val other = freshRoot("bm_guard_other")
    val dst = freshRoot("bm_guard_dst")
    ManifestTable.create(Seq((1L, 1L)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.create(Seq((1L, 1L)).toDF("id", "v"),
      "id", other, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst)
    val v0 = ManifestTable.currentVersion(spark, src).get
    assert(ManifestTable.mergeBranch(spark, src, dst, token = 1L) ==
      ((0L, 0L, 0L)))
    assert(ManifestTable.currentVersion(spark, src).contains(v0),
      "a never-diverged branch merges nothing")
    intercept[IllegalStateException] { // not a clone
      ManifestTable.mergeBranch(spark, src, other, token = 2L)
    }
    intercept[IllegalArgumentException] { // wrong source
      ManifestTable.mergeBranch(spark, other, dst, token = 3L)
    }
    // comparator-keyed sources refuse (the mergeInto discipline): the
    // upsert leg's identity mapping would bucket raw keys wrong
    val cmpSrc = freshRoot("bm_guard_cmp")
    val cmpDst = freshRoot("bm_guard_cmp_br")
    val sSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    ManifestTable.create(
      Seq(("Alpha", 1L), ("Beta", 2L)).toDF("k", "v"),
      "k", cmpSrc, numBuckets = 2, keyComparator = lower)
    ManifestTable.cloneAt(spark, cmpSrc, cmpDst, pin = false)
    ManifestTable.delete(spark, cmpDst, sSchema, "k", Seq("Alpha"),
      token = 1L)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.mergeBranch(spark, cmpSrc, cmpDst, token = 4L)
    }
    assert(e.getMessage.contains("comparator"), e.getMessage)
  }
}
