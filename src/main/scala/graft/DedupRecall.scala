package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch: measured LSH dedup recall vs exact shingle Jaccard, by
// perturbation level and (bands, rowsPerBand) — numbers for RECALL.md
object DedupRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").limit(600).cache()

    // perturbed copies: drop the last ceil(p * words) words
    val levels = Seq(0.02, 0.05, 0.10, 0.20, 0.30)
    val pairs = levels.zipWithIndex.map { case (p, li) =>
      val off = (li + 1) * 10000000L
      docs.select(
        (col("doc_id") + off).as("doc_id"),
        expr(s"""array_join(slice(split(text, '\\\\s+'), 1,
          greatest(1, cast(size(split(text, '\\\\s+')) * ${1 - p} as int))), ' ')""")
          .as("text"),
        lit(p).as("p"), col("doc_id").as("orig"))
    }
    val copies = pairs.reduce(_ unionByName _).cache()
    val corpus = docs.unionByName(
      copies.select("doc_id", "text")).cache()

    // exact true Jaccard per planted pair
    val sh = corpus.select(col("doc_id"),
      graft.operators.Dedup.shingles(col("text"), 3).as("sh"))
    val truth = copies.select(col("doc_id"), col("orig"), col("p"))
      .join(sh.select(col("doc_id"), col("sh").as("sh_c")), "doc_id")
      .join(sh.select(col("doc_id").as("orig"), col("sh").as("sh_o")), "orig")
      .withColumn("j",
        size(array_intersect(col("sh_c"), col("sh_o"))).cast("double") /
          size(array_union(col("sh_c"), col("sh_o"))))
      .select(col("doc_id"), col("orig"), col("p"), col("j")).cache()
    truth.count()

    val configs = Seq((8, 4), (8, 8), (16, 4), (16, 8), (32, 4))
    println("cfg\tbin\tn\trecall\ttheory")
    configs.foreach { case (bands, rows) =>
      val idx = graft.operators.Dedup.bandIndex(corpus, bands, rows)
      val cand = idx.alias("a").join(idx.alias("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("orig"))
        .dropDuplicates()
      val hit = truth.join(cand, Seq("doc_id", "orig"), "left_semi")
        .groupBy(floor(col("j") * 5).as("bin")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val tot = truth.groupBy(floor(col("j") * 5).as("bin"))
        .agg(count(lit(1)).as("n"), avg("j").as("jm"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      tot.sortBy(_._1).foreach { case (bin, n, jm) =>
        val rec = hit.getOrElse(bin, 0L).toDouble / n
        val theory = 1.0 - math.pow(1.0 - math.pow(jm, rows), bands)
        println(f"b=$bands%d,r=$rows%d\tJ=[${bin * 0.2}%.1f,${bin * 0.2 + 0.2}%.1f)\t$n%d\t$rec%.2f\t$theory%.2f")
      }
    }
    spark.stop()
  }
}
