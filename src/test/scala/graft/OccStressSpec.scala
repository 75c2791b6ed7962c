package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.store.ManifestTable

/** RANDOMIZED N-writer OCC composition: the pairwise interleavings are
  * spec'd elsewhere (CommitFrontSpec, ManifestTableSpec's per-stream
  * replay); this drives >= 4 CONCURRENT writers — merges, delta
  * merges, keyed deletes, predicate UPDATEs, incremental RECLUSTERs
  * and compactions racing through one table —
  * and asserts the serializable outcome with NO lost update, through
  * BOTH commit fronts (no-overwrite rename and conditional-put).
  *
  * The oracle needs no knowledge of the commit ORDER: each writer owns
  * a DISJOINT key range and its operations are deterministic from a
  * seeded RNG, so per-key effects commute across writers and the final
  * table must equal the union of each writer's sequentially-replayed
  * model — any deviation is a lost or doubled update. One SHARED key
  * (contended by every writer's merges) checks the conflicting case:
  * its final value must be the last committer's, i.e. a member of the
  * candidate set, and version arithmetic must account for every
  * commit exactly once. */
class OccStressSpec extends SparkSpec {
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

  private def freshRoot(name: String): String = {
    val root = s"target/test-tmp/$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    root
  }

  private val SharedKey = 0L

  /** One writer's op stream, deterministic from the seed. Ops speak
    * ONLY the writer's own key range [base, base+width) plus the
    * shared key. Returns the writer's expected final own-range state
    * and its shared-key bid (the value its LAST shared merge wrote,
    * if any). */
  private case class Op(kind: String, keys: Seq[Long], batch: Long)

  private def planOps(writer: Int, steps: Int, seed: Long): Seq[Op] = {
    val rng = new scala.util.Random(seed + writer)
    val base = 1000L * (writer + 1)
    (0 until steps).map { s =>
      val kind = rng.nextInt(12) match {
        case 0 | 1 => "delete"
        case 2 => "compact"
        case 3 | 4 => "delta"
        case 10 => "update" // predicate UPDATE over the own range
        case 11 => "recluster" // incremental layout maintenance
        case _ => "merge"
      }
      val keys = (0 until (1 + rng.nextInt(8)))
        .map(_ => base + rng.nextInt(40)).distinct.sorted
      Op(kind, keys, s.toLong)
    }
  }

  /** Sequential replay of one writer's ops — the model. */
  private def model(writer: Int, ops: Seq[Op])
      : (Map[Long, (String, Long)], Option[String]) = {
    var own = Map.empty[Long, (String, Long)]
    var sharedBid: Option[String] = None
    ops.foreach { op =>
      op.kind match {
        case "delete" => own = own -- op.keys
        case "compact" | "recluster" => ()
        case "update" =>
          // UPDATE ... SET score = score + 1000 WHERE id IN (own keys):
          // only keys currently PRESENT change
          op.keys.foreach { k =>
            own.get(k).foreach { case (n, v) => own += k -> (n, v + 1000) }
          }
        case _ =>
          op.keys.foreach { k =>
            own += k -> (s"w$writer-b${op.batch}", k % 97)
          }
          // merges also bid on the shared contended key
          if (op.kind == "merge") sharedBid = Some(s"w$writer-b${op.batch}")
      }
    }
    (own, sharedBid)
  }

  private def runWriter(root: String, writer: Int, ops: Seq[Op],
      start: CountDownLatch): Unit = {
    val m = mapping
    start.await(30, TimeUnit.SECONDS)
    ops.foreach { op =>
      op.kind match {
        case "delete" =>
          ManifestTable.delete(spark, root, schema, "id", op.keys,
            token = op.batch, tokenStream = Some(s"W$writer#del"))
        case "compact" =>
          ManifestTable.compact(spark, root, schema, "id",
            token = writer * 1000L + op.batch)
        case "update" =>
          ManifestTable.updateWhere(spark, root, schema,
            assign = df => Seq("score" -> (df("score") + 1000L)),
            condition = df => df("id").isin(op.keys: _*),
            token = op.batch, tokenStream = Some(s"W$writer#upd"))
        case "recluster" =>
          ManifestTable.recluster(spark, root, schema,
            token = op.batch, tokenStream = Some(s"W$writer#rec"))
        case kind =>
          val ownRows = op.keys.map(k =>
            (k, s"w$writer-b${op.batch}", (k % 97).toString))
          val rows =
            if (kind == "merge")
              ownRows :+ ((SharedKey, s"w$writer-b${op.batch}", "0"))
            else ownRows
          ManifestTable.merge(m.project(raw(rows: _*)), op.batch, m,
            root, schema, numBuckets = 4, streamId = s"W$writer",
            delta = kind == "delta")
      }
    }
  }

  private def stress(front: Option[String], seed: Long, name: String,
      writers: Int = 4, steps: Int = 6,
      declaredCompact: Boolean = false): Unit = {
    front.foreach(f => spark.conf.set("spark.graft.commitFront", f))
    try {
      val root = freshRoot(name)
      // version-0 bootstrap holding only the shared key, so every
      // writer's first commit races an existing table; a cluster
      // layout on `score` so racing RECLUSTER ops have a recorded
      // definition to refresh
      ManifestTable.create(
        Seq((SharedKey, "seed", 0L)).toDF("id", "name", "score"),
        "id", root, numBuckets = 4)
      ManifestTable.clusterBy(spark, root, schema, "id", "score",
        token = 999999L, filesPerBucket = 2)
      // declared compaction racing N writers: every writer's commits
      // can trigger hook folds, each its own OCC commit — the folds
      // must stay row-invisible under every interleaving
      if (declaredCompact)
        ManifestTable.autoMaintain(spark, root, compactFiles = 2)
      val vStart = ManifestTable.currentVersion(spark, root).get
      val plans = (0 until writers).map(w => planOps(w, steps, seed))
      val pool = Executors.newFixedThreadPool(writers)
      val start = new CountDownLatch(1)
      val futures = (0 until writers).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = runWriter(root, w, plans(w), start)
        })
      }
      start.countDown()
      futures.foreach(_.get(300, TimeUnit.SECONDS))
      pool.shutdown()

      // --- serializability oracle ---------------------------------
      val models = (0 until writers).map(w => model(w, plans(w)))
      val expectedOwn: Map[Long, (String, Long)] =
        models.map(_._1).reduce(_ ++ _) // disjoint ranges: union
      val got = ManifestTable.read(spark, root, schema).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      // 1. every owned key holds exactly its writer's sequential
      //    outcome — a lost update (or a doubled/ghost row) fails here
      assert(got.filterNot(_._1 == SharedKey) == expectedOwn,
        s"own-range state diverged: " +
          s"missing=${(expectedOwn.keySet -- got.keySet).toSeq.sorted.take(5)} " +
          s"ghost=${(got.keySet - SharedKey -- expectedOwn.keySet).toSeq.sorted.take(5)}")
      // 2. the contended shared key holds SOME writer's last bid (or
      //    the seed if nobody merged) — and exactly one row for it
      val sharedVal = got.get(SharedKey).map(_._1)
      val bids = models.flatMap(_._2).toSet + "seed"
      assert(sharedVal.exists(bids), s"shared key holds $sharedVal, " +
        s"not one of $bids")
      // 3. version arithmetic: every merge/delta/delete/update/
      //    recluster serializes as exactly one commit (miss paths
      //    commit their token); compactions may legitimately no-op
      //    pre-commit when nothing is tiered, so they bound from above
      val nonCompact = plans.map(_.count(_.kind != "compact")).sum
      val total = plans.map(_.size).sum
      val v = ManifestTable.currentVersion(spark, root).get - vStart
      // declared compaction adds at most ONE hook-fold commit per
      // data commit (the nested pass is depth-guarded)
      val upper = if (declaredCompact) total * 2 else total
      assert(v >= nonCompact && v <= upper,
        s"$v commits outside [$nonCompact, $upper] — a commit was " +
          "lost or doubled")
      // 4. the per-stream replay ledgers hold each writer's LAST
      //    batch/token — interleaved writers never clobber each other
      val lb = ManifestTable.currentManifest(spark, root).get.lastBatches
      (0 until writers).foreach { w =>
        val lastMerge = plans(w).filter(o =>
          o.kind == "merge" || o.kind == "delta").map(_.batch)
        if (lastMerge.nonEmpty)
          assert(lb.get(s"W$w").contains(lastMerge.max),
            s"writer $w merge ledger: ${lb.get(s"W$w")} != ${lastMerge.max}")
        val lastDel = plans(w).filter(_.kind == "delete").map(_.batch)
        if (lastDel.nonEmpty)
          assert(lb.get(s"W$w#del").contains(lastDel.max),
            s"writer $w delete ledger: ${lb.get(s"W$w#del")} != " +
              s"${lastDel.max}")
        val lastUpd = plans(w).filter(_.kind == "update").map(_.batch)
        if (lastUpd.nonEmpty)
          assert(lb.get(s"W$w#upd").contains(lastUpd.max),
            s"writer $w update ledger: ${lb.get(s"W$w#upd")} != " +
              s"${lastUpd.max}")
      }
    } finally front.foreach(_ => spark.conf.unset("spark.graft.commitFront"))
  }

  test("4 writers x 6 randomized ops (merge/delta/delete/update/" +
      "recluster/compact) through the RENAME front: serializable, no " +
      "lost updates") {
    stress(None, seed = 42L, name = "occ_stress_rename")
  }

  test("4 writers x 6 randomized ops (incl. update/recluster) through " +
      "the CONDITIONAL-PUT front: serializable, no lost updates, " +
      "different seed") {
    stress(Some("conditional-put"), seed = 1337L,
      name = "occ_stress_cput")
  }

  test("4 writers racing DECLARED COMPACTION on the hot table: hook " +
      "folds from every writer's commits stay row-invisible and " +
      "serializable") {
    stress(None, seed = 99L, name = "occ_stress_hook",
      declaredCompact = true)
  }

  test("8 writers on one hot table: total commit ATTEMPTS stay inside " +
      "the O(commits x writers) OCC budget — no retry runaway") {
    // Fairness/liveness, not just serializability: a losing writer
    // recomputes its WHOLE op per retry, so the cost model of OCC
    // under contention is the attempt count. Theory bound: each
    // attempt round publishes at least one winner, so with W
    // concurrent writers a commit costs ≤ W attempts and the run
    // costs ≤ totalCommits × W. A retry runaway (livelock, a loser
    // repeatedly racing itself, a miss-path that never records its
    // token) blows past that budget and fails here, with the measured
    // number in the message for adjudication.
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val prev = ManifestTable.testBeforeCommit
    ManifestTable.testBeforeCommit =
      () => { attempts.incrementAndGet(); () }
    try {
      val writers = 8
      val steps = 4
      stress(None, seed = 7L, name = "occ_stress_8w",
        writers = writers, steps = steps)
      val totalOps = writers * steps
      // +2 for the fixture's own create + clusterBy commits; compact
      // ops may retry too, so they stay in the budget's commit count
      val budget = (totalOps + 2) * writers
      val measured = attempts.get()
      assert(measured <= budget,
        s"8-writer run used $measured commit attempts for ~$totalOps " +
          s"commits (budget $budget) — OCC retries are running away; " +
          "add jittered backoff to the retry loops")
      info(s"8 writers x $steps ops: $measured attempts for " +
        s"<= ${totalOps + 2} commits (budget $budget)")
    } finally ManifestTable.testBeforeCommit = prev
  }
}
