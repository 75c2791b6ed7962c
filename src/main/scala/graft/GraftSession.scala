package graft

import org.apache.spark.sql.SparkSession

/** Recommended session wiring for graft deployments.
  *
  * Local mode: pass `local[N]` and shuffle partitions ≈ N. Cluster mode:
  * leave master to spark-submit and size `shufflePartitions` to ~2-3× total
  * executor cores (or rely on AQE coalescing, which is enabled here). The
  * graft SQL functions are registered via [[GraftExtensions]].
  */
object GraftSession {

  def builder(
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
}
