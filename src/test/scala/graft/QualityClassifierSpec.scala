package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier

/** Pins the supervised quality gate: closed-form NB log-odds training
  * recovers a separable seed (including on held-out docs), the model is
  * bounded, the broadcast-join and literal-map scoring paths are
  * bit-identical (integer milli-nats), scoring never throws on
  * null/empty text, and the plan is one broadcast join + one aggregate.
  * The driver-facing oracle lives in `quality_classifier`
  * (planted-recovery closed form). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def seed: DataFrame =
    ((0 until 40).map(i => (i.toLong,
      s"the quick brown fox jumps over entry $i casino jackpot pills",
      false)) ++
      (40 until 80).map(i => (i.toLong,
        s"the quick brown fox considers theorem lemma proof case $i",
        true))).toDF("id", "text", "label")

  test("separable seed: every doc — holdout included — classifies " +
      "back; the model is bounded by the bucket space") {
    val m = QualityClassifier.train(
      seed.filter($"id" % 5 < 4), $"text", $"label")
    val got = QualityClassifier.score(seed, m, "id", $"text")
      .join(seed.select($"id", $"label"), "id")
    assert(got.count() == 80)
    assert(got.filter($"pred" =!= $"label").count() == 0,
      "a separable planted seed must classify 100%")
    val nw = m.weights.count()
    assert(nw > 0 && nw <= math.pow(16, 4).toLong)
    // balanced seed: the doc prior is zero
    assert(m.biasMilli == 0L)
  }

  test("broadcast-join path and literal-map path are bit-identical " +
      "(exact integer milli-nats)") {
    val m = QualityClassifier.train(
      seed, $"text", $"label", hexChars = 2)
    val (wMap, bias) = QualityClassifier.collectModel(m)
    assert(wMap.size <= 256)
    val viaJoin = QualityClassifier.score(seed, m, "id", $"text")
      .select($"id", $"score_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = seed.select($"id",
      QualityClassifier.scoreExpr(wMap, bias, $"text", hexChars = 2)
        .as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == viaExpr)
  }

  test("null and empty text never throw and score exactly the bias " +
      "plus the empty-token bucket") {
    // unbalanced seed -> nonzero bias; seed has no empty tokens, so an
    // empty doc's single feature bucket is unseen (weight 0) and the
    // score IS the bias
    val unb = seed.filter($"label" || $"id" < 10)
    val m = QualityClassifier.train(unb, $"text", $"label")
    assert(m.biasMilli != 0L)
    val got = QualityClassifier.score(
      Seq((1L, null: String), (2L, ""), (3L, "   ")).toDF("id", "text"),
      m, "id", $"text").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.forall(_._2 == m.biasMilli), got.mkString(", "))
    assert(got.forall(_._3 == 1L), "one empty-token feature each")
  }

  test("plan shape: scoring is scan -> explode -> ONE broadcast join " +
      "-> one per-doc aggregate; no sort-merge join, no window") {
    val m = QualityClassifier.train(seed, $"text", $"label")
    val plan = QualityClassifier.score(seed, m, "id", $"text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), "weights must broadcast")
    assert(!plan.contains("Window"), "no window in a scoring plan")
  }

  test("NULL-labeled seed rows contribute NOTHING: the model equals " +
      "one trained without them (no (0,0)-bucket prior bias)") {
    // unbalanced classes, so a coerced null would have produced
    // non-zero (0,0)-bucket weights
    val unb = seed.filter($"label" || $"id" < 10)
    val withNulls = unb.union(
      Seq((900L, "zq unlabeled junk features zq", null.asInstanceOf[Any]))
        .map(t => (t._1, t._2.toString,
          Option.empty[Boolean])).toDF("id", "text", "label"))
    val a = QualityClassifier.collectModel(
      QualityClassifier.train(unb, $"text", $"label"))
    val b = QualityClassifier.collectModel(
      QualityClassifier.train(withNulls, $"text", $"label"))
    assert(a == b,
      "a null-label doc must not materialize biased (0,0) buckets")
  }

  test("training is deterministic: retrain yields identical weights " +
      "and bias") {
    val a = QualityClassifier.collectModel(
      QualityClassifier.train(seed, $"text", $"label"))
    val b = QualityClassifier.collectModel(
      QualityClassifier.train(seed, $"text", $"label"))
    assert(a == b)
  }

  test("usage errors are loud") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(seed, $"text", $"label", hexChars = 6)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(seed, $"text", $"label", alpha = 0.0)
    }
  }
}
