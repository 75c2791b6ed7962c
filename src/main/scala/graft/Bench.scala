package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup so the first timed query of each plan-shape family doesn't
    // absorb one-time JVM/JIT/codegen startup: one action through the
    // parquet read + aggregate path, then the flagship upsert on the
    // TINY sf0.001 fixture — which Janino-compiles the parser expression
    // family shared by the whole upsert group. Bench numbers then track
    // plan cost rather than which query happens to run first.
    spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("count(distinct c_custkey)").collect()
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup entry failed: ${e.getMessage}") }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(
            s"[bench] $name failed: ${String.valueOf(e.getMessage).take(300)}")
          -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
