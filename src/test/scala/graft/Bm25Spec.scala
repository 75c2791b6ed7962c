package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** Pins BM25 lexical search: hand-computed scores on a tiny corpus,
  * the bounded-model discipline (DF table ≤ bucket space, broadcast
  * scoring plan with no Window), ranking semantics (tf saturation,
  * length normalization, idf ordering), query/corpus tokenization
  * parity, null/empty-text safety, and the deterministic top-k
  * tie-break. The driver-facing closed-form oracle lives in
  * `bm25_search`. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (0L, "spark shuffles data across the cluster"),
    (1L, "spark spark spark everywhere spark"),
    (2L, "a very long document about nothing in particular that " +
      "rambles on and on and mentions spark exactly once near the " +
      "end of a meandering paragraph full of filler words"),
    (3L, "cluster management and data locality"),
    (4L, "")).toDF("doc_id", "text")

  test("hand-computed BM25 on a tiny corpus (k1=1.2, b=0.75, " +
      "Lucene idf)") {
    val m = Bm25.fit(corpus)
    assert(m.nDocs == 5L)
    val got = Bm25.score(corpus, m, "spark cluster")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // reference implementation, independently in Scala
    val docs = corpus.collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
          .trim.split(" ", -1).toSeq)
      .toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def dfOf(t: String) = docs.values.count(_.contains(t))
    def idf(t: String) =
      math.log(1.0 + (n - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
    def expected(id: Long, terms: Seq[String]): Option[(Long, Long)] = {
      val tk = docs(id)
      val hits = terms.filter(t => tk.contains(t))
      if (hits.isEmpty) None
      else Some((hits.map { t =>
        val tf = tk.count(_ == t).toDouble
        math.round(idf(t) * (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * tk.size / avgdl)) * 1000.0)
      }.sum, hits.size.toLong))
    }
    val want = docs.keys.flatMap(id =>
      expected(id, Seq("spark", "cluster")).map(id -> _)).toMap
    assert(got == want, s"got $got want $want")
    // semantic sanity on a single-term query (doc 0 hits BOTH terms
    // of the two-term query, so its total is not comparable):
    val one = Bm25.score(corpus, m, "spark")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tf saturation — five "spark"s beat one, but nowhere near 5x
    assert(one(1L) > one(0L))
    assert(one(1L) < 5L * one(0L))
    // length normalization — the rambler's single mention scores
    // below the short doc's single mention
    assert(one(2L) < one(0L))
    // no-hit docs are absent, empty text is absent
    assert(!got.contains(4L) && !one.contains(3L) && !one.contains(4L))
  }

  test("model is bounded by the bucket space and collisions only " +
      "merge buckets (df never exceeds nDocs)") {
    val m = Bm25.fit(corpus, hexChars = 1)
    val rows = m.df.collect()
    assert(rows.length <= 16)
    assert(rows.forall(_.getLong(1) <= m.nDocs))
  }

  test("query tokenization is the corpus tokenization (punctuation, " +
      "case) and an all-junk query refuses loudly") {
    val m = Bm25.fit(corpus)
    val a = Bm25.score(corpus, m, "SPARK, cluster!")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Bm25.score(corpus, m, "spark cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
    val e = intercept[IllegalArgumentException] {
      Bm25.score(corpus, m, "??!")
    }
    assert(e.getMessage.contains("tokenized to nothing"))
  }

  test("topK ranks by score desc with deterministic id tie-break " +
      "and bounds the result") {
    val dup = Seq(
      (0L, "alpha beta"), (1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "gamma")).toDF("doc_id", "text")
    val m = Bm25.fit(dup)
    val got = Bm25.topK(dup, m, "alpha", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // three identical scores: ids 0 and 1 win on the id tie-break
    assert(got.toSeq == Seq((0L, 1), (1L, 2)))
  }

  test("scoring plan: one broadcast join, no Window, no sort before " +
      "the aggregate") {
    val m = Bm25.fit(corpus)
    val plan = Bm25.score(corpus, m, "spark cluster")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Window"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
