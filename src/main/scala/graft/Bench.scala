package graft
import org.apache.spark.sql.SparkSession

/** Steady-state benchmark. Each query runs K times (SPARK_GRAFT_BENCH_REPS,
  * default 3) in one process and the MEDIAN is reported: a single-shot
  * number confounds plan cost with JIT/codegen warmup and FS-cache state,
  * which is exactly the variance that had to be re-adjudicated in prose
  * for three rounds. Per-query fixture hooks ([[SparkEntry.benchSetups]])
  * run OUTSIDE the timed region before every rep, so e.g. `manifest_merge`
  * times a real incremental MERGE against a freshly reset table — never
  * the fixture's own create(), never an idempotent replay.
  *
  * Output: ONE JSON line. `queries` keeps the original name→seconds
  * contract (now the median), rounded to 1 ms. The full per-rep detail
  * (name→{med,min,runs[],cpu[],mf}) is written to BENCH_STATS.json in the
  * working directory instead of the line — the r5 stdout artifact was
  * front-truncated past ~2.5 KB, so the line carries only what must
  * survive capture and points at the file (`stats_file`).
  *
  * `cpu` is the PROCESS CPU-time delta (seconds) over the same rep:
  * ambient machine load is adjudicable from the artifact instead of
  * prose — a contended run shows wall time far above cpu/threads while
  * an expensive plan shows them tracking (the r6 `decontaminate` "6×
  * regression" was exactly this ambiguity: unreproducible on the same
  * code+fixture at any thread count, wall-only evidence).
  *
  * CONTENTION SENTINEL: three rounds of official artifacts landed on a
  * contended machine and needed prose adjudication, so the benchmark
  * now measures the machine itself. A fixed CPU-bound calibration probe
  * (an allocation-free single-core mixing loop — pure compute, no I/O,
  * no Spark job, so the long-lived benchmark JVM's own accumulating
  * state cannot masquerade as contention) establishes a baseline
  * (median of 5 samples after its own warmup) and re-runs every 8
  * queries; each
  * query's `mf` is the BETTER of the two probes bracketing its block
  * over the baseline (one slow sample — a GC, a noise burst — must not
  * condemn a whole block), and the line's `machine_factor` is the
  * median over all samples — 1.0 = quiet, 2.0 = the machine was
  * delivering half its calibrated throughput.
  * Queries measured while the probe read inflated (mf > 1.5) are
  * automatically RE-RUN after the main pass and report the better
  * median (both measurements stay in the stats file, `rechecked` names
  * them) — adjudication becomes mechanical: compare `calib_base` across
  * rounds for absolute machine speed, read `mf`/`rechecked` for
  * within-run interference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup so the first timed query of each plan-shape family doesn't
    // absorb one-time JVM/JIT/codegen startup: one action through the
    // parquet read + aggregate path, then the flagship upsert on the
    // TINY sf0.001 fixture — which Janino-compiles the parser expression
    // family shared by the whole upsert group.
    try spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("count(distinct c_custkey)").collect()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup read failed: ${e.getMessage}") }
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup entry failed: ${e.getMessage}") }

    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    // ---- contention sentinel -------------------------------------------
    // The probe is a PURE, allocation-free driver loop — deliberately
    // NOT a Spark job: a job-shaped probe measured the benchmark JVM's
    // own accumulated state (GC pressure, codegen caches, listener
    // backlog grow monotonically over a 105-query run and inflated the
    // probe 3× by the end, flagging 73 phantom rechecks), while a tight
    // single-core loop with zero allocation sees only what the sentinel
    // is FOR: CPU competition from outside this process.
    @volatile var calibSink = 0L
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < 300000000L) {
        h = java.lang.Long.rotateLeft(h ^ i, 31) * 0x100000001B3L
        i += 1L
      }
      calibSink = h // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    calibrate(); calibrate() // probe's own JIT warmup, discarded
    // baseline = MEDIAN of 5 (min would be optimistic on a probe this
    // short and flag phantom contention all run)
    val calibBase = (1 to 5).map(_ => calibrate()).sorted.apply(2)
    val calibSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def sampleMachine(): Unit = calibSamples += r3(calibrate())

    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to the named queries — for
    // iterating on one regression without paying the full 100+-query run.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Process CPU time is a HotSpot extension: degrade to wall-only
    // (cpu 0) on JVMs without it — or when it answers -1 — rather than
    // aborting the whole benchmark on a ClassCastException.
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def cpuTime: Long =
      osBean.map(_.getProcessCpuTime).filter(_ >= 0).getOrElse(0L)

    def runQuery(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Seq[(Double, Double, Boolean)], Double, Boolean) = {
      val setup = SparkEntry.benchSetups.get(name)
      val runs = (1 to reps).map { _ =>
        try setup.foreach(f => f(spark, sfDir))
        catch { case e: Throwable =>
          System.err.println(
            s"[bench] $name setup failed: ${String.valueOf(e.getMessage).take(300)}")
        }
        val c0 = cpuTime
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] $name failed: ${String.valueOf(e.getMessage).take(300)}")
            false
        }
        (r3((System.nanoTime() - t0) / 1e9),
          r3(math.max(0L, cpuTime - c0) / 1e9), ok)
      }
      val failed = runs.exists(!_._3)
      val sorted = runs.map(_._1).sorted
      val med =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else r3((sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2)
      (runs, med, failed)
    }

    // A query that throws must never masquerade as a timing: any rep
    // failure marks the query `"err"` in the JSON line (excluded from
    // `total`, listed under `errors`) — BENCH_r08 recorded the events
    // family's time-to-exception as an apparent 6x speedup.
    sampleMachine()
    // SORTED order: Map iteration order reshuffles whenever a query is
    // added, and neighbors matter (JIT/GC/cache state bleeds between
    // queries) — r10 measured a 10×-looking "regression" on untouched
    // queries that was pure re-ordering. Name order is stable across
    // rounds, so per-query cross-round comparison stays meaningful.
    val firstPass = selected.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), i) =>
        if (i > 0 && i % 8 == 0) sampleMachine()
        val (runs, med, failed) = runQuery(name, fn)
        (name, fn, runs, med, failed, i / 8)
    }
    sampleMachine()
    // a query's factor = the BETTER of the probes bracketing its block:
    // a single slow sample (GC, one noisy neighbor burst) must not
    // condemn every query near it — sustained contention shows on both
    // sides of the block
    def factorOf(block: Int): Double = {
      val before = calibSamples(math.min(block, calibSamples.size - 1))
      val after = calibSamples(math.min(block + 1, calibSamples.size - 1))
      r3(math.max(1.0, math.min(before, after) / calibBase))
    }
    // RE-RUN queries whose neighborhood probe saw interference; keep the
    // better median (both stay in the stats file)
    val results = firstPass.map {
      case (name, fn, runs, med, failed, block) =>
        val mf = factorOf(block)
        if (!failed && mf > 1.5) {
          System.err.println(
            s"[bench] $name measured at machine_factor $mf — rechecking")
          val (runs2, med2, failed2) = runQuery(name, fn)
          if (!failed2 && med2 < med)
            (name, runs, med2, failed, mf, Some((runs2, med2)))
          else (name, runs, med, failed, mf,
            Some((runs2, if (failed2) med else med2)))
        } else (name, runs, med, failed, mf, None)
    }
    val qs = results.map { case (k, _, med, failed, _, _) =>
      if (failed) s""""$k":"err"""" else s""""$k":$med"""
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, true, _, _) => s""""$k"""" }
      .mkString("[", ",", "]")
    val rechecked = results
      .collect { case (k, _, _, _, _, Some(_)) => s""""$k"""" }
      .mkString("[", ",", "]")
    val stats = results.map { case (k, runs, med, failed, mf, re) =>
      val base = s""""$k":{"med":$med,"min":${runs.map(_._1).min},""" +
        s""""err":$failed,"mf":$mf,""" +
        s""""runs":[${runs.map(_._1).mkString(",")}],""" +
        s""""cpu":[${runs.map(_._2).mkString(",")}]"""
      re match {
        case Some((runs2, _)) =>
          base + s""","recheck_runs":[${runs2.map(_._1).mkString(",")}]}"""
        case None => base + "}"
      }
    }.mkString("{", ",", "}")
    val total = r3(results.collect { case (_, _, med, false, _, _) => med }.sum)
    val sortedSamples = calibSamples.sorted
    val machineFactor = r3(math.max(1.0,
      sortedSamples(sortedSamples.size / 2) / calibBase))
    val calibJson =
      s""""calib_base":${r3(calibBase)},""" +
        s""""calib_samples":[${calibSamples.mkString(",")}]"""
    val statsPath = java.nio.file.Paths.get("BENCH_STATS.json")
    java.nio.file.Files.writeString(statsPath,
      s"""{"reps":$reps,"sf":"$sfDir","errors":$errors,""" +
        s""""machine_factor":$machineFactor,$calibJson,""" +
        s""""rechecked":$rechecked,"queries_stats":$stats}""" + "\n")
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"errors":$errors,"machine_factor":$machineFactor,"calib_base":${r3(calibBase)},"rechecked":$rechecked,"stats_file":"BENCH_STATS.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
