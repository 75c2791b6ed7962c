package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall-time profiler for one declared query (optimization-round
  * tooling, not part of the driver contract). Runs the query like Bench
  * (setup outside the timed region, count() as the action) with a
  * listener recording every Spark job's wall span, task count and
  * executor-time sum. The report splits the timed region into job spans
  * vs driver-side gaps — on local[32] with sf0.1 fixtures most queries
  * are gap/scheduling-bound, and this shows exactly which phase.
  *
  * Usage: runMain graft.Profile <query>[,<query>...] [reps]
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.)
  */
object Profile {
  private final case class JobRec(
      id: Int, desc: String, start: Long, var end: Long = 0L,
      var tasks: Int = 0, var taskTime: Long = 0L, var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(e.stageInfo.stageId, -1)
        val r = jobs.get(jid)
        if (r != null) {
          r.tasks += e.stageInfo.numTasks
          r.stages += 1
          r.taskTime += e.stageInfo.taskMetrics.executorRunTime
        }
      }
    }

    // Warmup mirroring Bench
    try spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("count(distinct c_custkey)").collect()
    catch { case _: Throwable => () }
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val setup = SparkEntry.benchSetups.get(name)
      (1 to reps).foreach { rep =>
        setup.foreach(f => f(spark, sfDir))
        jobs.clear(); stageToJob.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val t0ms = System.currentTimeMillis()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val recs = jobs.values.asScala.toSeq.sortBy(_.start)
        val jobSum = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
        println(f"%n=== $name rep $rep: wall $wall%.3f s, " +
          f"${recs.size} jobs ($jobSum%.3f s in jobs, " +
          f"${wall - jobSum}%.3f s driver gaps) ===")
        println(f"${"t0+ms"}%8s ${"ms"}%7s ${"stg"}%4s ${"tasks"}%6s " +
          f"${"exec_ms"}%8s  desc")
        recs.foreach { r =>
          val dur = math.max(0L, r.end - r.start)
          println(f"${r.start - t0ms}%8d $dur%7d ${r.stages}%4d " +
            f"${r.tasks}%6d ${r.taskTime}%8d  ${r.desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
