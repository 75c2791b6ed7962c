package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised quality filtering — the fastText-supervised shape
  * (Joulin et al., "Bag of Tricks for Efficient Text Classification",
  * 2016) the big web corpora actually gate with: CCNet scores pages
  * against a Wikipedia-vs-crawl classifier and FineWeb-Edu against an
  * educational-value classifier. Heuristic quality (TextAnalysis),
  * LM perplexity bands (NgramLm) and importance weights (Dsir) are the
  * unsupervised gates; this is the LABELED one: train on a seed of
  * good/bad examples, score every document scan-side.
  *
  * Same linear model family as fastText (bag of hashed unigram +
  * bigram features, linear decision), but trained CLOSED-FORM as
  * multinomial Naive Bayes log-odds instead of SGD — one distributed
  * hash aggregate over the seed instead of an iterative driver loop
  * (the NBSVM observation: NB log-count ratios are a strong linear
  * text baseline — Wang & Manning 2012). Everything rides the
  * engine's bounded-model discipline (NgramLm/Dsir/count-min):
  *
  *  - features hash to `16^hexChars` buckets via md5 prefix (the
  *    [[NgramLm.toks]] tokenization every text oracle mirrors), so the
  *    MODEL IS BOUNDED regardless of seed size and always broadcasts;
  *  - per-bucket weights are INTEGER milli-nats:
  *    `w(b) = round(1000·(ln((cp+α)/(Tp+αB)) − ln((cn+α)/(Tn+αB))))`
  *    (cp/cn = positive/negative bucket counts, Tp/Tn totals, B bucket
  *    count, α Laplace smoothing) — document scores are exact integer
  *    sums, so the broadcast-join path and the literal-map path are
  *    bit-identical (spec-pinned), never float-order-sensitive;
  *  - `bias` is the doc-count prior `round(1000·ln((np+α)/(nn+α)))`;
  *    predict keep ⇔ `bias + Σ w(feature) > 0`.
  *
  * Scale shape: training is ONE hash aggregate over the seed (output ≤
  * 16^hexChars rows — broadcast-sized at any seed size) plus one
  * bounded doc-count agg; scoring is scan → explode → one broadcast
  * join → one map-side-partial per-doc sum (the only shuffle), or —
  * [[predictExpr]] — a pure scalar column with the model as a literal
  * map (the streaming / inline-projection shape, `hexChars ≤ 2`
  * guidance as with [[NgramLm.costExpr]]). Nothing about the corpus is
  * ever collected. */
object QualityClassifier {

  /** A trained model: bounded per-bucket integer milli-nat weights
    * (`(b string, w long)`, ≤ `16^hexChars` rows), the doc-prior bias
    * in milli-nats, and the hash width scoring must reuse. */
  final case class QcModel(
      weights: DataFrame,
      biasMilli: Long,
      hexChars: Int)

  /** Unigram + adjacent-bigram feature GRAM strings of a TOKEN ARRAY —
    * the one extraction train and every scoring path share. NULL/empty
    * text tokenizes to the single empty token ([[NgramLm.toks]]), so
    * every document scores. Callers in [[train]]/[[score]] MATERIALIZE
    * the token array as its own projection first (the NgramLm.score
    * discipline) and bucket AFTER the explode (md5 in a flat codegen'd
    * projection) — the original inline shape re-ran the tokenization
    * inside interpreted HOF lambdas per element and cost 20× the whole
    * pipeline. [[scoreExpr]] feeds the inline tokenization because a
    * scalar column can't project; [[NgramLm.pairGrams]]' zip_with shape
    * keeps even that O(tokens). */
  private def gramsOf(tk: Column): Column =
    concat(tk,
      when(size(tk) >= 2, NgramLm.pairGrams(tk))
        .otherwise(array().cast("array<string>")))

  private def bucket(g: Column, hexChars: Int): Column =
    substring(md5(g), 1, hexChars)

  /** Trains on a labeled seed: `label` TRUE = positive ("keep").
    * One feature aggregate (≤ `16^hexChars` rows, materialized
    * driver-side like [[NgramLm.train]] so scoring's broadcast build
    * is a LocalTableScan) + one doc-count aggregate. Two bounded
    * actions; weights computed closed-form from the collected counts. */
  def train(
      seed: DataFrame,
      text: Column = col("text"),
      label: Column = col("label"),
      hexChars: Int = 4,
      alpha: Double = 0.5): QcModel = {
    require(hexChars >= 1 && hexChars <= 5,
      s"hexChars must be in [1, 5] (16^5 = 1M buckets is already " +
        s"beyond broadcast-comfortable), got $hexChars")
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val spark = seed.sparkSession
    // NULL labels are DROPPED, not coerced: `when(_y, 1).otherwise(0)`
    // would route a null-label doc into NEITHER class count while
    // still materializing its buckets as (0, 0) rows — which score
    // ln((Tn+aB)/(Tp+aB)) ≠ 0 whenever the classes are unbalanced, a
    // silent class-prior-dependent bias that a truly-unseen bucket
    // (weight 0) never carries. Unlabeled rows contribute nothing.
    val labeled = seed.filter(label.isNotNull)
    val counts = labeled
      .select(label.cast("boolean").as("_y"),
        NgramLm.toks(text).as("_tk"))
      .select(col("_y"), explode(gramsOf(col("_tk"))).as("_g"))
      .select(col("_y"), bucket(col("_g"), hexChars).as("_b"))
      .groupBy(col("_b"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_cp"),
        sum(when(!col("_y"), 1L).otherwise(0L)).as("_cn"))
      .collect()
    val tp = counts.iterator.map(_.getLong(1)).sum.toDouble
    val tn = counts.iterator.map(_.getLong(2)).sum.toDouble
    val b = math.pow(16.0, hexChars)
    val rows: Seq[(String, Long)] = counts.iterator.map { r =>
      val w = math.log((r.getLong(1) + alpha) / (tp + alpha * b)) -
        math.log((r.getLong(2) + alpha) / (tn + alpha * b))
      r.getString(0) -> math.round(w * 1000.0)
    }.toSeq
    import spark.implicits._
    val weights = rows.toDF("b", "w")
    val Array(np, nn) = labeled.select(
      sum(when(label.cast("boolean"), 1L).otherwise(0L)),
      sum(when(!label.cast("boolean"), 1L).otherwise(0L)))
      .collect().head.toSeq.map(v => Option(v).fold(0L)(_.asInstanceOf[Long]))
      .toArray
    val bias = math.round(
      (math.log(np + alpha) - math.log(nn + alpha)) * 1000.0)
    QcModel(weights, bias, hexChars)
  }

  /** Scores every document: `(idCol, score_milli, n_features, pred)`.
    * `score_milli` = bias + Σ weight (exact integer milli-nats),
    * `pred` ⇔ score_milli > 0. Pure plan — scan, explode, ONE
    * broadcast join, one per-doc sum. */
  def score(
      corpus: DataFrame,
      model: QcModel,
      idCol: String = "doc_id",
      text: Column = col("text")): DataFrame = {
    val w = model.weights.select(col("b").as("_bm"), col("w").as("_w"))
    corpus
      .select(col(idCol), NgramLm.toks(text).as("_tk"))
      .select(col(idCol), explode(gramsOf(col("_tk"))).as("_g"))
      .select(col(idCol), bucket(col("_g"), model.hexChars).as("_b"))
      .join(broadcast(w), col("_b") === col("_bm"), "left")
      .groupBy(col(idCol))
      .agg(
        (sum(coalesce(col("_w"), lit(0L))) + model.biasMilli)
          .as("score_milli"),
        count(lit(1)).as("n_features"))
      .withColumn("pred", col("score_milli") > 0L)
  }

  /** The same decision as [[score]]'s `pred`, as a pure scalar COLUMN
    * with the model riding the plan as a literal map — the stream /
    * inline-projection shape ([[NgramLm.costExpr]]'s sizing guidance:
    * keep `hexChars ≤ 2` when training for inline use). Bit-identical
    * to [[score]] (integer milli-nats; spec-pinned). */
  def scoreExpr(
      weights: Map[String, Long],
      biasMilli: Long,
      text: Column = col("text"),
      hexChars: Int = 2): Column = {
    val wM = typedLit(weights)
    aggregate(gramsOf(NgramLm.toks(text)), lit(biasMilli),
      (acc, g) => acc +
        coalesce(element_at(wM, bucket(g, hexChars)), lit(0L)))
  }

  /** Collects a trained model's bounded weight table into the
    * literal-map form [[scoreExpr]] needs. */
  def collectModel(model: QcModel): (Map[String, Long], Long) =
    (model.weights.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap,
      model.biasMilli)
}
