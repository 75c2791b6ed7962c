package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val sparkDocs = Seq(
    "spark query engine shuffles partitions across the cluster",
    "the query optimizer prunes partitions before the shuffle",
    "catalyst plans the query and tungsten runs the engine")
  private val cookingDocs = Seq(
    "simmer the onions in butter until golden and sweet",
    "fold the flour into the batter and bake until risen",
    "season the broth with thyme and reduce it slowly")

  test("target-domain docs outscore off-domain docs") {
    val target = sparkDocs.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val corpus = (sparkDocs ++ cookingDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = Dsir.weights(target, corpus)
    val scores = Dsir.score(corpus, w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sparkScores = (0 until 3).map(i => scores(i.toLong))
    val cookScores = (3 until 6).map(i => scores(i.toLong))
    assert(sparkScores.min > cookScores.max,
      s"every target-domain doc must outscore every off-domain doc: " +
        s"spark=$sparkScores cooking=$cookScores")
  }

  test("weight table is bounded by 256 buckets; scores are deterministic") {
    val target = sparkDocs.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val corpus = (sparkDocs ++ cookingDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = Dsir.weights(target, corpus)
    assert(w.count() <= 256)
    val once = Dsir.score(corpus, w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // integer scores: exact under any partitioning / evaluation order
    val again = Dsir.score(corpus.repartition(5), w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == again)
  }
}
