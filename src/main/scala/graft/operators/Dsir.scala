package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with hashed n-gram features (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * 2023): score every corpus document by how much its hashed n-gram
  * distribution looks like a TARGET corpus relative to a BACKGROUND
  * corpus — the importance weight log(p_target(doc)/p_background(doc))
  * under bucketed unigram+bigram models. High scorers are "looks like
  * the target domain" and get sampled into the training mix.
  *
  * Engine-reproducible by construction, so the DuckDB oracle recomputes
  * identical scores:
  *  - the feature bucket is the first two hex chars of md5(gram) — 256
  *    buckets, no engine-specific hash;
  *  - per-bucket log-likelihood-ratio weights are rounded to INTEGERS
  *    once (256 values — a 1-ulp libm difference cannot move a rounded
  *    integer except exactly on a .5 boundary), and document scores are
  *    exact integer sums of those weights — no float-addition-order
  *    sensitivity.
  *
  * Scale shape: the weight table is ≤ 256 rows — trained with one
  * hash-aggregate per corpus and joined back as a BROADCAST, so scoring
  * is scan → explode → broadcast-join → one map-side-partial sum per
  * doc. Nothing about the corpus is ever collected or shuffled beyond
  * the per-doc aggregate.
  */
object Dsir {

  /** 256-way feature bucket: first two hex chars of md5(gram). */
  private def bucketOf(g: Column): Column = substring(md5(g), 1, 2)

  /** Unigram + bigram features (hashed DSIR's standard feature set). */
  private def grams(text: Column, ns: Seq[Int]): Column =
    flatten(array(ns.map(n => Dedup.shingles(text, n)): _*))

  /** Per-bucket integer weights: round(scale × [ln p̂_target(bucket) −
    * ln p̂_background(bucket)]) with add-one smoothing over the 256
    * buckets. ≤ 256 rows — broadcast it into [[score]]. */
  def weights(
      target: DataFrame,
      background: DataFrame,
      text: Column = col("text"),
      ns: Seq[Int] = Seq(1, 2),
      scale: Int = 1000): DataFrame = {
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(grams(text, ns)).as("_g"))
        .groupBy(bucketOf(col("_g")).as("bucket"))
        .agg(count(lit(1)).as("c"))
    val t = bucketCounts(target)
    val b = bucketCounts(background)
    // gram totals: scalar aggs (bounded collect of one row each);
    // coalesce so an EMPTY corpus (sum = NULL) degrades to the smoothed
    // uniform model instead of throwing
    val tTot = t.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val bTot = b.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    t.withColumnRenamed("c", "tc")
      .join(b.withColumnRenamed("c", "bc"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        round((log((coalesce(col("tc"), lit(0L)) + 1.0) /
            lit(tTot + 256.0)) -
          log((coalesce(col("bc"), lit(0L)) + 1.0) /
            lit(bTot + 256.0))) * scale)
          .cast("long").as("w"))
  }

  /** Per-document importance score: the exact integer sum of the
    * bucket weights of the document's grams (grams in buckets absent
    * from BOTH training corpora — impossible when the corpus is the
    * background, as in standard DSIR — contribute 0). Documents with no
    * real grams (empty/whitespace/null text) are NOT dropped by the
    * explode: the shingle fallback gives them one whole-text shingle, so
    * they score like any other doc and agree with [[scoreExpr]]
    * (spec-pinned in DsirSpec). */
  def score(
      corpus: DataFrame,
      weights: DataFrame,
      idCol: String = "doc_id",
      text: Column = col("text"),
      ns: Seq[Int] = Seq(1, 2)): DataFrame =
    corpus.select(col(idCol), explode(grams(text, ns)).as("_g"))
      .select(col(idCol), bucketOf(col("_g")).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(0L))).as("dsir_score"))

  /** The same score as a pure scalar COLUMN: the ≤256-entry weight
    * table rides the plan as a literal map and the per-doc sum folds
    * over the gram array in one expression — no explode, no join, no
    * aggregate. This is the shape for scoring a STREAM (stateless, so
    * it composes with any watermark/trigger) and for scoring inline in
    * a larger projection; results are identical to [[score]]. */
  def scoreExpr(
      weights: Map[String, Long],
      text: Column = col("text"),
      ns: Seq[Int] = Seq(1, 2)): Column = {
    val wMap = typedLit(weights)
    aggregate(grams(text, ns), lit(0L),
      (acc, g) => acc + coalesce(element_at(wMap, bucketOf(g)), lit(0L)))
  }

  /** Collects the bounded weight table (≤256 rows) into the literal-map
    * form [[scoreExpr]] needs. */
  def collectWeights(weights: DataFrame): Map[String, Long] =
    weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
}
