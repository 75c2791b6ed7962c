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

  test("empty/whitespace/null docs keep a score row; score ≡ scoreExpr " +
      "on them") {
    // The shingle fallback gives a gram-less document ONE whole-text
    // shingle ("" after normalization), so the explode in score() never
    // eliminates a document's rows — every corpus doc gets a score, and
    // the join path and the inline expression agree on the degenerates.
    val target = sparkDocs.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val corpus = ((sparkDocs ++ cookingDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) } ++
      Seq((90L, ""), (91L, "   \t\n "), (92L, null: String), (93L, "!!!")))
      .toDF("doc_id", "text")
    val w = Dsir.weights(target, corpus)
    val viaJoin = Dsir.score(corpus, w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaJoin.keySet == (0L until 6L).toSet ++ Set(90L, 91L, 92L, 93L),
      s"every doc (including gram-less ones) must score, got ${viaJoin.keySet}")
    val wMap = Dsir.collectWeights(w)
    val viaExpr = corpus.select(col("doc_id"),
      Dsir.scoreExpr(wMap).as("dsir_score")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaExpr == viaJoin,
      s"join path and inline expression must agree: $viaJoin vs $viaExpr")
    // all four degenerates normalize to the same empty shingle
    assert(Seq(91L, 92L, 93L).forall(i => viaJoin(i) == viaJoin(90L)))
  }

  test("inline scalar scoring equals the join path, with no shuffle") {
    val target = sparkDocs.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val corpus = (sparkDocs ++ cookingDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = Dsir.weights(target, corpus)
    val viaJoin = Dsir.score(corpus, w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wMap = Dsir.collectWeights(w)
    val inline = corpus.select(col("doc_id"),
      Dsir.scoreExpr(wMap).as("dsir_score"))
    val viaExpr = inline.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaExpr == viaJoin)
    val plan = inline.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"inline scoring must be a pure projection:\n$plan")
  }

  test("inline scoring works on a stream (stateless projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val target = sparkDocs.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val corpus = (sparkDocs ++ cookingDocs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val wMap = Dsir.collectWeights(Dsir.weights(target, corpus))
    val mem = MemoryStream[(Long, String)]
    mem.addData(0L -> sparkDocs.head, 3L -> cookingDocs.head)
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), Dsir.scoreExpr(wMap).as("dsir_score"))
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dsir_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Dsir.score(corpus, Dsir.weights(target, corpus)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == want(0L) && got(3L) == want(3L))
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
