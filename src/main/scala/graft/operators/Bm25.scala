package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical search — the keyword-retrieval complement to the ANN
  * family (Similarity/Pq). A training-data pipeline reaches for exactly
  * this shape for retrieval-based decontamination, targeted corpus
  * mining ("every doc that talks about X"), and hard-negative mining
  * for embedding training; Okapi BM25 (Robertson et al., TREC-3) is the
  * standard scoring function every lexical engine (Lucene, Tantivy)
  * ships.
  *
  * Spark-first shape under the engine's bounded-model discipline
  * (NgramLm/Dsir/QualityClassifier):
  *
  *  - the corpus-level model ([[fit]]) is per-BUCKET document
  *    frequencies — terms hash to `16^hexChars` md5-prefix buckets (the
  *    [[NgramLm.toks]] tokenization + bucketing every text oracle
  *    mirrors), so the DF table is BOUNDED at any corpus size and
  *    always broadcasts — plus two exact scalars (doc count, token
  *    count). One distinct-aggregate pass over the corpus, nothing else
  *    collected.
  *  - scoring ([[score]]) filters the exploded token stream to the
  *    QUERY's buckets first (an inner broadcast join against a ≤ |query|
  *    row frame — at 100 TB the non-matching ~100% of tokens die
  *    map-side, never shuffling), then one per-(doc, term) count and one
  *    per-doc sum. Per-term scores round to INTEGER milli-units before
  *    the document sum (the lm_score discipline: integer sums are
  *    addition-order-free, so DuckDB reproduces every score
  *    bit-for-bit; a double sum would hash-flicker on reorder).
  *  - [[topK]] ranks through [[TopKByScore]] — the bounded
  *    TypedImperativeAggregate every ANN path uses; no Window, no
  *    global sort.
  *
  * BM25 constants ride as exact integer millis (k1 = 1200, b = 750
  * defaults) so both engines derive the identical doubles. IDF is the
  * Lucene-shaped `ln(1 + (N − df + 0.5)/(df + 0.5))` — always positive,
  * so a term occurring in most documents (the synthetic corpus's
  * regime) still contributes signal instead of flipping negative. */
object Bm25 {

  /** Corpus statistics: bounded per-bucket document frequencies
    * (`(b string, df long)`, ≤ `16^hexChars` rows), exact doc/token
    * counts, and the hash width scoring must reuse. */
  final case class Bm25Model(
      df: DataFrame,
      nDocs: Long,
      nTokens: Long,
      hexChars: Int) {
    /** Average document length, derived from the two exact counts the
      * same way the oracle derives it. */
    def avgDl: Double = nTokens.toDouble / math.max(nDocs, 1L)
  }

  private def bucket(g: Column, hexChars: Int): Column =
    substring(md5(g), 1, hexChars)

  /** One pass over the corpus: per-bucket DOCUMENT frequency (distinct
    * (doc, bucket) then count — the one shuffle) + the two exact
    * scalars. The DF table is materialized driver-side like
    * [[NgramLm.train]] (≤ `16^hexChars` rows) so [[score]]'s broadcast
    * build is a LocalTableScan, not a re-run of the aggregate. */
  def fit(
      corpus: DataFrame,
      idCol: String = "doc_id",
      text: Column = col("text"),
      hexChars: Int = 4): Bm25Model = {
    require(hexChars >= 1 && hexChars <= 5,
      s"hexChars must be in [1, 5], got $hexChars")
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol), NgramLm.toks(text).as("_tk"))
    val Array(nDocs, nTokens) = base
      .select(count(lit(1)), sum(size(col("_tk"))))
      .collect().head.toSeq
      .map(v => Option(v).fold(0L)(_.asInstanceOf[Long])).toArray
    require(nDocs > 0,
      "cannot fit BM25 on an empty corpus (avgdl is undefined)")
    val dfLocal = base
      .select(col(idCol), explode(col("_tk")).as("_w"))
      .select(col(idCol), bucket(col("_w"), hexChars).as("_b"))
      .distinct()
      .groupBy(col("_b")).agg(count(lit(1)).as("_df"))
      .collect()
    import spark.implicits._
    val df = dfLocal.map(r => r.getString(0) -> r.getLong(1)).toSeq
      .toDF("b", "df")
    Bm25Model(df, nDocs, nTokens, hexChars)
  }

  /** Scores every document containing at least one query term:
    * `(idCol, score_milli, n_terms_hit)`. Query terms run through the
    * SAME tokenization as the corpus (so "Spark-SQL" queries the terms
    * a document would actually index under); per-term IDF constants are
    * resolved driver-side against the bounded DF table and ride the
    * broadcast frame. Docs matching no term are absent (inner join) —
    * BM25 of an empty match set is 0, not a row. */
  def score(
      corpus: DataFrame,
      model: Bm25Model,
      query: String,
      idCol: String = "doc_id",
      text: Column = col("text"),
      k1Milli: Int = 1200,
      bMilli: Int = 750): DataFrame = {
    val terms = tokenizeQuery(corpus, query)
    require(terms.nonEmpty, s"query tokenized to nothing: '$query'")
    val spark = corpus.sparkSession
    val k1 = k1Milli / 1000.0
    val bb = bMilli / 1000.0
    // Driver-side md5 == engine md5 == oracle md5; the DF table is
    // bounded, so the per-term lookup is a tiny local map.
    val dfMap = model.df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Dedup by BUCKET, not term: two query terms colliding into one
    // bucket must not double-count the joined tokens (they are the
    // same indexed feature, exactly as a corpus-side collision merges).
    val qRows = terms.distinct
      .map(t => md5Hex(t).take(model.hexChars)).distinct
      .map { b =>
        val dfT = dfMap.getOrElse(b, 0L)
        val idf = math.log(
          1.0 + (model.nDocs - dfT + 0.5) / (dfT + 0.5))
        (b, idf)
      }
    import spark.implicits._
    val q = qRows.toDF("_qb", "_idf")
    corpus
      .select(col(idCol), NgramLm.toks(text).as("_tk"))
      .select(col(idCol), size(col("_tk")).as("_dl"),
        explode(col("_tk")).as("_w"))
      .select(col(idCol), col("_dl"),
        bucket(col("_w"), model.hexChars).as("_b"))
      .join(broadcast(q), col("_b") === col("_qb"))
      .groupBy(col(idCol), col("_qb"), col("_idf"), col("_dl"))
      .agg(count(lit(1)).as("_tf"))
      .select(col(idCol), {
        // Arithmetic ORDER is part of the contract: the oracle mirrors
        // this exact association (idf * tf-part, then / norm, then
        // * 1000) so both engines round the identical double.
        val tfd = col("_tf").cast("double")
        val dld = col("_dl").cast("double")
        val norm = lit(1.0 - bb) + lit(bb) * dld / lit(model.avgDl)
        round(col("_idf") * (tfd * lit(k1 + 1.0)) /
          (tfd + lit(k1) * norm) * lit(1000.0))
          .cast("long").as("_s")
      })
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("score_milli"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Top-k search results, ranked by `score_milli` with the engine's
    * deterministic id tie-break, through the bounded [[TopKByScore]]
    * aggregate (no Window, no global sort — the ANN ranking shape). */
  def topK(
      corpus: DataFrame,
      model: Bm25Model,
      query: String,
      k: Int,
      idCol: String = "doc_id",
      text: Column = col("text")): DataFrame = {
    val scored = score(corpus, model, query, idCol, text)
    val B = org.apache.spark.sql.graft.Bridge
    val topk = B.column(TopKByScore(
      B.expression(col("score_milli").cast("double")),
      B.expression(col(idCol).cast("long")), k)
      .toAggregateExpression())
    scored.agg(topk.as("topk"))
      .select(posexplode(col("topk")).as(Seq("r0", "e")))
      .select(col("e.id").as(idCol),
        col("e.score").cast("long").as("score_milli"),
        (col("r0") + 1).cast("int").as("rank"))
  }

  /** The corpus tokenization applied to the query string, evaluated
    * eagerly on a one-row local frame (keeps query-vs-document
    * tokenization identical by construction instead of by parallel
    * reimplementation). */
  private def tokenizeQuery(corpus: DataFrame, query: String): Seq[String] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq(query).toDF("q")
      .select(NgramLm.toks(col("q")).as("tk"))
      .collect().head.getSeq[String](0)
      .filter(_.nonEmpty)
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}
