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

  test("schema divergence: branch-added columns need evolveSchema " +
      "(then NULL-fill the source); source-added and re-typed refuse") {
    // ADD ON BRANCH: default refuses naming the column; evolveSchema
    // lands it — merged keys carry values, untouched source rows NULL
    val src = freshRoot("bm_ev_src")
    val dst = freshRoot("bm_ev_dst")
    ManifestTable.create(
      (1L to 10L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    val wider = StructType(schema.fields :+ StructField("w", LongType))
    val mW = new graft.mapping.Mapping()
    Seq("id", "v", "w").foreach(mW.auto(_))
    mW.complete(wider)
    ManifestTable.merge(mW.project(
      Seq((Seq("3", "33", "333"), 0L)).toDF("_raw", "_line")),
      1L, mW, dst, wider, evolveSchema = true)
    val e1 = intercept[IllegalArgumentException] {
      ManifestTable.mergeBranch(spark, src, dst, token = 70L)
    }
    assert(e1.getMessage.contains("w") &&
      e1.getMessage.contains("evolveSchema"), e1.getMessage)
    assert(ManifestTable.recordedSchema(spark, src).get.fieldNames
      .toSeq == Seq("id", "v"), "a refusal must not evolve the source")
    val (up, _, _) = ManifestTable.mergeBranch(spark, src, dst,
      token = 70L, evolveSchema = true)
    assert(up == 1L)
    val got = ManifestTable.read(spark, src).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got.find(_._1 == 3L).contains((3L, 33L, 333L)))
    assert(got.filter(_._1 != 3L).forall(_._3 == -1L),
      s"untouched source rows must NULL-fill the branch's column: $got")

    // ADD ON SOURCE: always refuses with the rebase story
    val src2 = freshRoot("bm_ev_src2")
    val dst2 = freshRoot("bm_ev_dst2")
    ManifestTable.create(
      (1L to 10L).map(i => (i, i)).toDF("id", "v"),
      "id", src2, numBuckets = 2)
    ManifestTable.cloneAt(spark, src2, dst2, pin = false)
    mergeRows(dst2, 1L, (4L, 44L))
    ManifestTable.evolveSchema(spark, src2, wider)
    val e2 = intercept[IllegalArgumentException] {
      ManifestTable.mergeBranch(spark, src2, dst2, token = 71L,
        evolveSchema = true) // evolveSchema never excuses this side
    }
    assert(e2.getMessage.contains("Rebase"), e2.getMessage)

    // RE-TYPE (branch widened a column the source kept narrow): refuses
    val src3 = freshRoot("bm_ev_src3")
    val dst3 = freshRoot("bm_ev_dst3")
    ManifestTable.create(
      Seq((1L, 5)).toDF("id", "n"), "id", src3, numBuckets = 2)
    ManifestTable.cloneAt(spark, src3, dst3, pin = false)
    ManifestTable.widenColumn(spark, dst3, "n", LongType)
    val mN = new graft.mapping.Mapping()
    Seq("id", "n").foreach(mN.auto(_))
    val sW = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    mN.complete(sW)
    ManifestTable.merge(mN.project(
      Seq((Seq("2", "6"), 0L)).toDF("_raw", "_line")), 1L, mN, dst3, sW)
    val e3 = intercept[IllegalArgumentException] {
      ManifestTable.mergeBranch(spark, src3, dst3, token = 72L)
    }
    assert(e3.getMessage.contains("diverged") &&
      e3.getMessage.contains("re-typ"), e3.getMessage)
  }

  test("source-mode crash between legs: the retry deletes the " +
      "PERSISTED adjudicated set, not a re-derivation that lost the " +
      "conflict anti-join") {
    val src = freshRoot("bm_crash_src")
    val dst = freshRoot("bm_crash_dst")
    ManifestTable.create(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    // branch DELETES 5 (conflicted: the source edits 5 after the bind)
    // and 6 (clean); updates 7
    ManifestTable.delete(spark, dst, schema, "id", Seq(5L, 6L),
      token = 1L)
    mergeRows(dst, 2L, (7L, 77L))
    mergeRows(src, 9L, (5L, 500L)) // the conflicting source edit
    // construct the exact mid-crash state a "source" merge leaves when
    // it dies between legs: the adjudicated delete set persisted (only
    // the CLEAN delete — 5 was conflict-dropped), the upsert leg's
    // token landed on the per-branch stream, the delete leg missing
    val token = 80L
    val pending = ManifestTable.mergePendingDir(spark, src, dst, token)
    Seq(Tuple1(6L)).toDF("id").write.parquet(pending.toString)
    val qBranch = {
      val p = new org.apache.hadoop.fs.Path(dst)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    val mU = new graft.mapping.Mapping()
    Seq("id", "v").foreach(mU.auto(_))
    mU.complete(schema)
    ManifestTable.merge(mU.project(
      Seq((Seq("7", "77"), 0L)).toDF("_raw", "_line")),
      token, mU, src, schema,
      streamId = s"graft-merge-branch:$qBranch")
    // the retry completes ONLY the delete leg, from the persisted set
    ManifestTable.mergeBranch(spark, src, dst, token = token,
      onConflict = "source")
    val st = state(src)
    assert(st(5L) == 500L,
      "retry must not delete the conflicted key the adjudication " +
        s"dropped: ${st.get(5L)}")
    assert(!st.contains(6L), "the clean delete must complete")
    assert(st(7L) == 77L)
    assert(!pending.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(pending),
      "the pending set must clean up after the delete leg lands")
    // and a full-fresh "source" merge round-trips the same shape in
    // one call (pending written + consumed internally)
    val src2 = freshRoot("bm_crash_src2")
    val dst2 = freshRoot("bm_crash_dst2")
    ManifestTable.create(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"),
      "id", src2, numBuckets = 2)
    ManifestTable.cloneAt(spark, src2, dst2, pin = false)
    ManifestTable.delete(spark, dst2, schema, "id", Seq(5L, 6L),
      token = 1L)
    mergeRows(src2, 9L, (5L, 500L))
    val (_, del2, conf2) = ManifestTable.mergeBranch(spark, src2, dst2,
      token = 81L, onConflict = "source")
    assert(conf2 == 1L && del2 == 1L)
    val st2 = state(src2)
    assert(st2(5L) == 500L && !st2.contains(6L))
    assert(!new java.io.File(s"$src2/mergepending").exists() ||
      new java.io.File(s"$src2/mergepending").list().isEmpty)
  }

  test("source-mode with an ALL-CONFLICTED delete set: the empty " +
      "adjudicated set outlives the merge, so replays can never " +
      "resurrect the dropped deletes from the raw feed") {
    val src = freshRoot("bm_empty_src")
    val dst = freshRoot("bm_empty_dst")
    ManifestTable.create(
      (1L to 20L).map(i => (i, i)).toDF("id", "v"),
      "id", src, numBuckets = 2)
    ManifestTable.cloneAt(spark, src, dst, pin = false)
    // the branch's ONLY delete is conflicted (source edits 5 after
    // the bind) and it also updates 7 (clean) — the adjudicated
    // delete set is EMPTY, so the delete leg never records its token
    ManifestTable.delete(spark, dst, schema, "id", Seq(5L), token = 1L)
    mergeRows(dst, 2L, (7L, 77L))
    mergeRows(src, 9L, (5L, 500L))
    val (up, del, conf) = ManifestTable.mergeBranch(spark, src, dst,
      token = 90L, onConflict = "source")
    assert(up == 1L && del == 0L && conf == 1L)
    assert(state(src)(5L) == 500L, "adjudication keeps the source's 5")
    // REPLAY the same token (crash-retry / at-least-once caller): the
    // raw branch feed still says "delete 5" — the persisted empty set
    // must win, every time
    ManifestTable.mergeBranch(spark, src, dst, token = 90L,
      onConflict = "source")
    assert(state(src)(5L) == 500L,
      "a replay must not re-derive the conflict-dropped delete")
    ManifestTable.mergeBranch(spark, src, dst, token = 90L,
      onConflict = "source")
    assert(state(src)(5L) == 500L, "…nor any later replay")
  }
}
