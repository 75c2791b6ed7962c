package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity scoring (Wenzek et al.,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data", 2020): train a bigram model with stupid backoff (Brants et
  * al. 2007) on a REFERENCE corpus (the "good" text — CCNet uses
  * Wikipedia), then score every corpus document by its average
  * per-term negative log-probability. Low scorers read like the
  * reference; CCNet keeps the head/middle of the distribution and
  * drops the tail. The reference implementation is a KenLM binary —
  * this is the same gate re-expressed as two bounded hash aggregates
  * and three broadcast joins.
  *
  * Engine-reproducible by construction (the [[Dsir]] discipline), so a
  * DuckDB oracle recomputes identical scores:
  *  - n-grams hash to `16^hexChars` buckets via md5 prefix — no
  *    engine-specific hash, and the MODEL IS BOUNDED regardless of
  *    corpus size (the scale story: vocabulary never grows past the
  *    bucket count, so the model always broadcasts);
  *  - each term's cost is an INTEGER: round(scale × nats) — a 1-ulp
  *    libm divergence cannot move a rounded integer off a .5 boundary;
  *    document costs are exact integer sums and the average is integer
  *    division, so no float-addition-order sensitivity anywhere;
  *  - bucket collisions can only make a cost ratio exceed 1 (a bigram
  *    bucket outweighing its context's unigram bucket); the context
  *    count is clamped up to the bigram count, so costs stay ≥ 0 and
  *    both engines clamp identically.
  *
  * Cost model, per document (all counts are bucket counts over the
  * reference; N = reference token count):
  *  - first token w:  seen → ln((N+1)/c1(w)),  unseen → ln(N+1)
  *  - each bigram (p,w):
  *      c2(p,w) > 0   → ln(max(c1(p), c2(p,w)) / c2(p,w))
  *      else c1(w) > 0 → ln(2.5·(N+1) / c1(w))     (stupid backoff, α=0.4)
  *      else           → ln(2.5·(N+1))             (OOV)
  * `avg_cost_milli` = total integer cost div term count — the
  * log-perplexity in milli-nats (perplexity itself is exp of it;
  * filtering on either is equivalent, and log space keeps integers).
  *
  * Scale shape: training is two hash aggregates over the reference
  * (output ≤ 16^hexChars rows each — broadcast-sized at any corpus
  * size) plus one bounded count; scoring is scan → explode →
  * 3 broadcast joins → one map-side-partial per-doc sum. Nothing about
  * the corpus is collected, and the only shuffle is the per-doc
  * aggregate. */
object NgramLm {

  /** A trained model: bounded unigram/bigram bucket counts (≤
    * `16^hexChars` rows each), the reference token count, and the
    * quantization parameters scoring must reuse. */
  final case class LmModel(
      uni: DataFrame,
      bi: DataFrame,
      nTokens: Long,
      hexChars: Int,
      scale: Int)

  /** The corpus tokenization every text operator's oracle mirrors
    * (`[^a-z0-9]+` → space, lower, trim, split): NULL and empty/junk
    * text both yield a single empty token, so every document scores —
    * and scores IDENTICALLY through [[score]], [[costExpr]] and the
    * oracle (a bare split(NULL) would route NULL text through the
    * bigram OOV branch in [[score]] only, breaking all three
    * contracts). */
  private[operators] def toks(text: Column): Column =
    split(trim(regexp_replace(lower(coalesce(text, lit(""))),
      "[^a-z0-9]+", " ")), " ")

  private def bucket(g: Column, hexChars: Int): Column =
    substring(md5(g), 1, hexChars)

  /** Adjacent-pair bigram strings ("prev w") of a token array; callers
    * filter to `size ≥ 2` first (a negative slice length would throw).
    * Shape matters: the earlier `transform(sequence(1, n-1), i =>
    * element_at(tk, i) …)` re-evaluated the OUTER `tk` expression per
    * element (interpreted HOF lambdas don't CSE captured trees), which
    * turns O(tokens²) — 20 s over 5k tiny docs — whenever a caller
    * passes the raw tokenization instead of a materialized column.
    * `zip_with` over two slices evaluates `tk` a constant number of
    * times and its lambda touches only BOUND variables, so the cost is
    * O(tokens) regardless of what `tk` is. */
  private[operators] def pairGrams(tk: Column): Column =
    zip_with(
      slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Trains the bounded bigram model on the reference corpus: two hash
    * aggregates, each MATERIALIZED driver-side (≤ `16^hexChars` rows —
    * the count-min/bloom discipline: a bounded model rides the scoring
    * plan as local data, so [[score]]'s three broadcast builds are
    * LocalTableScans instead of three re-runs of the training
    * aggregates over the reference corpus). Three bounded actions. */
  def train(
      reference: DataFrame,
      text: Column = col("text"),
      hexChars: Int = 4,
      scale: Int = 1000): LmModel = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexChars must be in [1, 8], got $hexChars")
    val spark = reference.sparkSession
    def local(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    val tk = reference.select(toks(text).as("_tk"))
    val uniToks = tk.select(explode(col("_tk")).as("_w"))
    val uni = local(uniToks
      .groupBy(bucket(col("_w"), hexChars).as("b"))
      .agg(count(lit(1)).as("c1")))
    val n = uniToks.count()
    val bi = local(tk.filter(size(col("_tk")) >= 2)
      .select(explode(pairGrams(col("_tk"))).as("_g"))
      .groupBy(bucket(col("_g"), hexChars).as("b"))
      .agg(count(lit(1)).as("c2")))
    LmModel(uni, bi, n, hexChars, scale)
  }

  /** Scores every document: (idCol, lm_cost, n_terms, avg_cost_milli).
    * `lm_cost` is the exact integer sum of per-term costs, `n_terms` =
    * max(1, token count), `avg_cost_milli` their integer quotient (the
    * document's log-perplexity in milli-nats). Pure plan — no actions. */
  def score(
      corpus: DataFrame,
      model: LmModel,
      idCol: String = "doc_id",
      text: Column = col("text")): DataFrame = {
    val h = model.hexChars
    val sc = model.scale
    val lnN = log(lit(model.nTokens + 1.0))
    val lnBk = log(lit(2.5 * (model.nTokens + 1.0)))
    val base = corpus.select(col(idCol), toks(text).as("_tk"))
    val bi = broadcast(model.bi)
    val up = model.uni.select(col("b").as("_bpm"), col("c1").as("_c1p"))
    val uw = model.uni.select(col("b").as("_bwm"), col("c1").as("_c1w"))
    // ONE corpus scan: the first token (unigram-scored) and every
    // adjacent pair (bigram-scored) ride a single exploded term array —
    // tokens never contain spaces, so a term's kind is recoverable from
    // its split arity, and a unigram term NULLs its bigram-side join
    // keys (a md5-collision hit on the bigram table would otherwise
    // misprice it).
    val terms = base.select(col(idCol), explode(concat(
        array(element_at(col("_tk"), 1)),
        when(size(col("_tk")) >= 2, pairGrams(col("_tk")))
          .otherwise(array().cast("array<string>")))).as("_g"))
    val sp = split(col("_g"), " ")
    val keyed = terms.select(col(idCol),
      (size(sp) === 1).as("_u"),
      when(size(sp) > 1, bucket(col("_g"), h)).as("_b2"),
      when(size(sp) > 1, bucket(element_at(sp, 1), h)).as("_bp"),
      bucket(element_at(sp, -1), h).as("_bw"))
    // The context count clamps up to the bigram count so a cross-bucket
    // collision can't produce a negative cost (DuckDB clamps
    // identically).
    keyed
      .join(bi, col("_b2") === bi("b"), "left")
      .join(broadcast(up), col("_bp") === col("_bpm"), "left")
      .join(broadcast(uw), col("_bw") === col("_bwm"), "left")
      .select(col(idCol),
        when(col("_u"),
          when(col("_c1w").isNotNull,
            round((lnN - log(col("_c1w").cast("double"))) * sc)
              .cast("long"))
            .otherwise(round(lnN * sc).cast("long")))
          .otherwise(
            when(bi("c2").isNotNull,
              round((log(greatest(coalesce(col("_c1p"), lit(0L)),
                  bi("c2")).cast("double")) -
                log(bi("c2").cast("double"))) * sc).cast("long"))
              .when(col("_c1w").isNotNull,
                round((lnBk - log(col("_c1w").cast("double"))) * sc)
                  .cast("long"))
              .otherwise(round(lnBk * sc).cast("long"))).as("_cost"))
      .groupBy(col(idCol))
      .agg(sum(col("_cost")).as("lm_cost"), count(lit(1)).as("n_terms"))
      .withColumn("avg_cost_milli", expr("lm_cost div n_terms"))
  }

  /** The same total cost as [[score]]'s `lm_cost`, as a pure scalar
    * COLUMN: the model rides the plan as two literal maps and the
    * per-term costs fold over the exploded-free term array in one
    * expression — no join, no aggregate, no shuffle. This is the shape
    * for scoring a STREAM (stateless, composes with any watermark) or
    * inline in a larger projection. Sized for SMALL models: a literal
    * map materializes in the plan, so keep `hexChars ≤ 2` (≤ 256
    * entries per map) when training for inline use — [[score]]'s
    * broadcast path is the right tool above that. Results are identical
    * to [[score]] (spec-pinned). */
  def costExpr(
      uniMap: Map[String, Long],
      biMap: Map[String, Long],
      nTokens: Long,
      text: Column = col("text"),
      hexChars: Int = 2,
      scale: Int = 1000): Column = {
    val uM = typedLit(uniMap)
    val bM = typedLit(biMap)
    val lnN = log(lit(nTokens + 1.0))
    val lnBk = log(lit(2.5 * (nTokens + 1.0)))
    val tk = toks(text)
    val firstCost = {
      val c1 = element_at(uM, bucket(element_at(tk, 1), hexChars))
      when(c1.isNotNull,
        round((lnN - log(c1.cast("double"))) * scale).cast("long"))
        .otherwise(round(lnN * scale).cast("long"))
    }
    val pairCosts = when(size(tk) >= 2,
      aggregate(pairGrams(tk), lit(0L), (acc, g) => {
        val sp = split(g, " ")
        val c2 = element_at(bM, bucket(g, hexChars))
        val c1p = element_at(uM, bucket(element_at(sp, 1), hexChars))
        val c1w = element_at(uM, bucket(element_at(sp, 2), hexChars))
        acc + when(c2.isNotNull,
          round((log(greatest(coalesce(c1p, lit(0L)), c2)
              .cast("double")) - log(c2.cast("double"))) * scale)
            .cast("long"))
          .when(c1w.isNotNull,
            round((lnBk - log(c1w.cast("double"))) * scale).cast("long"))
          .otherwise(round(lnBk * scale).cast("long"))
      })).otherwise(lit(0L))
    firstCost + pairCosts
  }

  /** Collects a trained model's bounded tables into the literal-map
    * form [[costExpr]] needs: (uniMap, biMap, nTokens). */
  def collectModel(model: LmModel): (Map[String, Long], Map[String, Long], Long) =
    (model.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      model.bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      model.nTokens)

  /** CCNet's head/middle/tail banding: thresholds are the exact
    * interpolated percentiles of `avg_cost_milli` at `headFrac` and
    * `1 − tailFrac` (one bounded 2-value action), labels in a `band`
    * column. CCNet trains on head+middle and drops the tail. */
  def bands(
      scored: DataFrame,
      headFrac: Double = 1.0 / 3,
      tailFrac: Double = 1.0 / 3): DataFrame = {
    require(headFrac > 0 && tailFrac > 0 && headFrac + tailFrac < 1,
      s"need 0 < headFrac, tailFrac and headFrac + tailFrac < 1")
    val th = scored.agg(
      expr(s"percentile(avg_cost_milli, $headFrac)"),
      expr(s"percentile(avg_cost_milli, ${1 - tailFrac})")).head()
    val (h, t) = (th.getDouble(0), th.getDouble(1))
    scored.withColumn("band",
      when(col("avg_cost_milli") <= h, "head")
        .when(col("avg_cost_milli") <= t, "middle")
        .otherwise("tail"))
  }
}
