package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val reference = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox runs over the green hill",
    "a lazy dog sleeps under the brown tree",
    "the brown fox and the lazy dog are friends")
  private def refDf = reference.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("in-domain text scores lower average cost than shuffled and " +
      "out-of-vocabulary text") {
    val model = NgramLm.train(refDf)
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"), // verbatim
      (1L, "dog lazy the over jumps fox brown quick the"), // same words, broken order
      (2L, "zygote quasar nebula proton entropy vortex")) // OOV
      .toDF("doc_id", "text")
    val s = NgramLm.score(corpus, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("avg_cost_milli"))).toMap
    assert(s(0L) < s(1L),
      s"reference word ORDER must matter (bigrams): $s")
    assert(s(1L) < s(2L),
      s"known words must beat OOV even shuffled (backoff): $s")
  }

  test("per-term costs are non-negative and integer-exact: lm_cost is " +
      "reproducible and avg is the integer quotient") {
    val model = NgramLm.train(refDf)
    val corpus = Seq((0L, "the quick brown fox"), (1L, ""),
      (2L, "one"), (3L, "  !!  ")).toDF("doc_id", "text")
    val rows = NgramLm.score(corpus, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("lm_cost"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("avg_cost_milli")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L),
      "every doc scores, including empty/junk text")
    rows.foreach { case (id, cost, n, avg) =>
      assert(cost >= 0, s"doc $id has negative cost $cost")
      assert(avg == cost / n, s"doc $id: avg must be cost div n_terms")
    }
    // 4 tokens → first + 3 bigrams
    assert(rows(0)._3 == 4L)
    // empty and junk text → a single (empty) token
    assert(rows(1)._3 == 1L && rows(3)._3 == 1L)
    assert(rows(2)._3 == 1L)
  }

  test("NULL text scores exactly like empty text, identically through " +
      "score and costExpr") {
    val model = NgramLm.train(refDf, hexChars = 2)
    val corpus = Seq((0L, None: Option[String]), (1L, Some("")))
      .toDF("doc_id", "text")
    val scored = NgramLm.score(corpus, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("lm_cost"),
        r.getAs[Long]("n_terms"))).sortBy(_._1)
    assert(scored(0)._2 == scored(1)._2 && scored(0)._3 == 1L,
      s"NULL and empty text must cost the same: $scored")
    val (uM, bM, n) = NgramLm.collectModel(model)
    val inline = corpus.select(col("doc_id"),
      NgramLm.costExpr(uM, bM, n, hexChars = 2).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inline(0L) == scored(0)._2,
      s"costExpr must match score on NULL text: $inline vs $scored")
  }

  test("scores are deterministic under repartition") {
    val model = NgramLm.train(refDf)
    val corpus = (0 until 40)
      .map(i => (i.toLong, reference(i % reference.size) + s" extra$i"))
      .toDF("doc_id", "text")
    val a = NgramLm.score(corpus, model).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = NgramLm.score(corpus.repartition(7), model).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("scoring plan: model joins broadcast, no sort-merge join") {
    val model = NgramLm.train(refDf)
    val corpus = Seq((0L, "the quick brown fox")).toDF("doc_id", "text")
    val plan = NgramLm.score(corpus, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"model lookups must broadcast, not shuffle the corpus:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("inline costExpr equals the join-based score for every doc " +
      "(the streaming shape)") {
    val model = NgramLm.train(refDf, hexChars = 2)
    val corpus = (Seq(
      "the quick brown fox jumps over the lazy dog",
      "dog lazy the over jumps fox brown quick the",
      "zygote quasar nebula proton entropy vortex",
      "", "one", "the the the the"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val joined = NgramLm.score(corpus, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("lm_cost"))).toMap
    val (uM, bM, n) = NgramLm.collectModel(model)
    val inline = corpus.select(col("doc_id"),
      NgramLm.costExpr(uM, bM, n, hexChars = 2).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inline == joined, s"inline $inline vs joined $joined")
    // and the inline plan is join- and exchange-free (streaming-safe)
    val plan = corpus.select(NgramLm.costExpr(uM, bM, n, hexChars = 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("bands partition the corpus into head/middle/tail by threshold") {
    val model = NgramLm.train(refDf)
    // three cohorts with clearly separated perplexity
    val corpus = ((0 until 10).map(i =>
        (i.toLong, reference(i % reference.size))) ++
      (10 until 20).map(i =>
        (i.toLong, "dog lazy the over jumps fox brown quick")) ++
      (20 until 30).map(i =>
        (i.toLong, "zygote quasar nebula proton entropy vortex")))
      .toDF("doc_id", "text")
    val banded = NgramLm.bands(NgramLm.score(corpus, model))
    val byBand = banded.collect()
      .groupBy(_.getAs[String]("band"))
      .map { case (k, rs) => (k, rs.map(_.getLong(0)).toSet) }
    assert(byBand.keySet == Set("head", "middle", "tail"))
    assert(byBand("head") == (0L until 10L).toSet, s"$byBand")
    assert(byBand("middle") == (10L until 20L).toSet, s"$byBand")
    assert(byBand("tail") == (20L until 30L).toSet, s"$byBand")
    // band thresholds must respect ordering: every head avg < every
    // tail avg (sanity on the percentile cutpoints)
    val avgs = banded.collect().map(r =>
      (r.getAs[String]("band"), r.getAs[Long]("avg_cost_milli")))
    assert(avgs.filter(_._1 == "head").map(_._2).max <
      avgs.filter(_._1 == "tail").map(_._2).min)
  }
}
