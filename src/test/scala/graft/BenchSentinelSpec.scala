package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention sentinel's detection threshold under
  * synthetic injected load — the r10 blind spot made concrete: the
  * driver's official artifact read 72.4 s against a 56.2 s committed
  * same-code capture while the single-core probe reported
  * machine_factor 1.0, because external load that eats most-but-not-all
  * cores never queues a 1-thread loop. The full-width probe must see
  * both the all-cores and the half-cores load patterns. */
class BenchSentinelSpec extends AnyFunSuite {

  /** CPU burners outside the sample path: same mixing loop, running
    * until stopped. Returns (stop handle, threads). */
  private def burn(n: Int): (java.util.concurrent.atomic.AtomicBoolean, Seq[Thread]) = {
    val halt = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ts = (0 until n).map { t =>
      val th = new Thread {
        override def run(): Unit = {
          var h = 0x9E3779B97F4A7C15L + t
          while (!halt.get()) {
            h = java.lang.Long.rotateLeft(h ^ 0x9E37L, 31) * 0x100000001B3L
          }
          // publish so the loop cannot be eliminated
          if (h == 42L) System.err.println(h)
        }
      }
      th.setDaemon(true)
      th.start()
      th
    }
    (halt, ts)
  }

  test("full-width probe detects all-core and partial-core contention") {
    assume(BenchSentinel.width >= 4,
      "contention geometry needs a multi-core machine")
    BenchSentinel.sample(); BenchSentinel.sample() // probe JIT warmup
    // min-of-k estimator — exactly what Bench uses at every sampling
    // point (single bursts are noisy enough on a shared-host VM to
    // read 1.3x quiet and flag phantom rechecks)
    val quiet = BenchSentinel.measure(7)

    // one burner per core: the probe's threads get half the machine —
    // expected inflation ~2.0; the sentinel's recheck trigger (1.2)
    // and the judge's detection bar (1.5) must both clear with margin.
    // 3 attempts, asserted on the MEDIAN: under sbt's PARALLEL suites
    // the "quiet" baseline itself can be load-inflated (measured 1.46x
    // in a full run that passes in isolation at ~2x) — tolerating ONE
    // poisoned attempt absorbs that physics flake, while any-of-3
    // would also pass a sentinel that detects saturation only
    // intermittently (the detection guarantee this leg exists for).
    val attempts = (1 to 3).map { _ =>
      val q = BenchSentinel.measure(7)
      val (stopFull, fullBurners) = burn(BenchSentinel.width)
      val loaded =
        try BenchSentinel.measure()
        finally { stopFull.set(true); fullBurners.foreach(_.join(2000)) }
      loaded / q
    }
    val fullInflation = attempts.sorted.apply(attempts.size / 2)
    assert(fullInflation > 1.5,
      s"median probe inflation $fullInflation (attempts " +
        s"${attempts.map(a => f"$a%.2f").mkString(", ")}) under " +
        "1-burner-per-core load — the sentinel would miss " +
        "machine-saturating contention more often than not")

    // HALF the cores busy — the r10 scenario class: plenty of cores
    // still free, so a single-core probe reads ~1.0, but wide stages
    // (and this probe) get width/(width + width/2) throughput —
    // expected inflation ~1.5
    val (stopHalf, halfBurners) = burn(BenchSentinel.width / 2)
    val halfLoad =
      try BenchSentinel.measure()
      finally { stopHalf.set(true); halfBurners.foreach(_.join(2000)) }
    val halfInflation = halfLoad / quiet
    assert(halfInflation > 1.2,
      s"probe read ${halfInflation}x under half-core load " +
        s"(quiet=$quiet loaded=$halfLoad) — the r10 blind spot " +
        "(load below core count invisible to the probe) is back")
  }

  test("per-rep bracket guard: a load transient between brackets " +
      "triggers a discard; steady state does not") {
    assume(BenchSentinel.width >= 4,
      "contention geometry needs a multi-core machine")
    BenchSentinel.sample(); BenchSentinel.sample() // probe JIT warmup
    // threshold algebra first — the pure decision the rep loop applies
    assert(!BenchSentinel.bracketsDisagree(0.06, 0.11)) // 1.8x: noise band
    assert(BenchSentinel.bracketsDisagree(0.06, 0.13))  // 2.2x: transient
    assert(BenchSentinel.bracketsDisagree(0.13, 0.06))  // symmetric
    // physics: a quiet opening bracket vs a bracket taken under
    // 1-burner-per-core load disagree well past 2x (the probe reads
    // ~(width + L) / width ≈ 2.0 under L = width burners, and min-of-k
    // tightens the quiet side) — the exact shape of the r13
    // manifest_merge_small [3.71, 7.71, 1.09] family this guard
    // exists to discard. Median-of-3 verdicts, same flake budget as
    // the detection leg above.
    val verdicts = (1 to 3).map { _ =>
      val b0 = BenchSentinel.measure(5)
      val (stop, burners) = burn(BenchSentinel.width)
      val b1 =
        try BenchSentinel.sample()
        finally { stop.set(true); burners.foreach(_.join(2000)) }
      BenchSentinel.bracketsDisagree(b0, b1)
    }
    assert(verdicts.count(identity) >= 2,
      s"bracket guard missed an injected all-core transient in " +
        s"${verdicts.count(!_)} of 3 attempts")
  }

  test("committed-stats reader: medians, err exclusion, probe-version gating") {
    val dir = java.nio.file.Files.createTempDirectory("benchstats")
    val p = dir.resolve("BENCH_STATS.json")

    // matching probe version: medians + calib_base both usable
    java.nio.file.Files.writeString(p,
      s"""{"reps":3,"calib_base":0.08,"calib_probe":"${BenchSentinel.probeVersion}",
         |"queries_stats":{"q_ok":{"med":1.25,"err":false},
         |"q_err":{"med":0.01,"err":true}}}""".stripMargin)
    val (meds, calib) = BenchSentinel.readCommittedStats(p)
    assert(meds == Map("q_ok" -> 1.25)) // err entries are not timings
    assert(calib.contains(0.08))

    // the r10 capture's single-core probe: its calib_base is in a
    // different unit and must NOT scale this run's thresholds — but
    // the wall-time medians stay usable
    java.nio.file.Files.writeString(p,
      """{"calib_base":0.534,"queries_stats":{"q":{"med":0.5,"err":false}}}""")
    val (meds2, calib2) = BenchSentinel.readCommittedStats(p)
    assert(meds2 == Map("q" -> 0.5) && calib2.isEmpty)

    // a capture at a DIFFERENT scale factor must not feed the trigger
    // (the sf1 refresh overwrites the same file name — sf0.1 medians
    // compared against sf1 walls would flag the whole suite)
    java.nio.file.Files.writeString(p,
      """{"sf":"/data/sf1","calib_base":0.08,
        |"queries_stats":{"q":{"med":0.5,"err":false}}}""".stripMargin)
    assert(BenchSentinel.readCommittedStats(p, Some("/data/sf0.1")) ==
      (Map.empty, None))
    assert(BenchSentinel.readCommittedStats(p, Some("/data/sf1"))._1 ==
      Map("q" -> 0.5))

    // garbled / missing file disables the trigger instead of failing
    java.nio.file.Files.writeString(p, "not json {")
    assert(BenchSentinel.readCommittedStats(p) == (Map.empty, None))
    assert(BenchSentinel.readCommittedStats(
      dir.resolve("absent.json")) == (Map.empty, None))
  }

  test("committed-stats reader prefers orig_med over the kept median") {
    // The recheck policy keeps the BETTER median (warm back-to-back
    // re-run), so kept medians on rechecked rows are systematically
    // fast — the r12 judge measured phantom cross-round "regressions"
    // concentrated exactly in the rechecked cohort. The reader must
    // hand the trigger the FIRST-PASS median (orig_med) when present
    // so rounds compare originals to originals; pre-r13 captures
    // without the field still serve their kept med.
    val dir = java.nio.file.Files.createTempDirectory("benchstats2")
    val p = dir.resolve("BENCH_STATS.json")
    java.nio.file.Files.writeString(p,
      """{"queries_stats":{
        |"q_rechecked":{"med":0.8,"orig_med":1.4,"err":false},
        |"q_quiet":{"med":0.5,"orig_med":0.5,"err":false},
        |"q_old_capture":{"med":0.9,"err":false}}}""".stripMargin)
    val (meds, _) = BenchSentinel.readCommittedStats(p)
    assert(meds == Map(
      "q_rechecked" -> 1.4, // the original, not the warm recheck
      "q_quiet" -> 0.5,
      "q_old_capture" -> 0.9)) // pre-orig_med capture falls back
  }
}
