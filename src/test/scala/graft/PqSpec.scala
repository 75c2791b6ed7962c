package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 10 well-separated cluster directions in 16d, 20 UNIQUE members each
  // (distinct perturbation per member so exact top-k has no ties).
  private def clustered = {
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 3) % dim) = 0.01f * m
      ((c * 20 + m).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes are m small ints; encoding is deterministic") {
    val emb = clustered
    val cb = Pq.train(emb, m = 4, ksub = 8, iters = 2)
    assert(cb.length == 4 && cb.forall(_.length == 8))
    val codes = Pq.encode(emb, cb).orderBy("vec_id").collect()
    assert(codes.forall(_.getSeq[Int](1).length == 4))
    val again = Pq.encode(emb, cb).orderBy("vec_id").collect()
    assert(codes.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // scale invariance: PQ codes are computed on the normalized vector
    val scaled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
    val codesScaled = Pq.encode(scaled, cb).orderBy("vec_id").collect()
    assert(codes.map(_.getSeq[Int](1)).toSeq
      == codesScaled.map(_.getSeq[Int](1)).toSeq)
  }

  test("ADC top-k recall vs exact brute force on clustered vectors") {
    val emb = clustered
    val queries = emb.filter($"vec_id" % 20 === 9)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // m=8 → 2-dim subspaces: the perturbation axis gets its own codebook,
    // fine enough to rank within a cluster.
    val cb = Pq.train(emb, m = 8, ksub = 16, iters = 3)
    val pq = Pq.topK(emb, queries, cb, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    // Every PQ neighbor must come from the query's cluster (the coarse
    // property quantization guarantees)...
    assert(pq.forall { case (q, v) => v / 20 == q / 20 },
      s"PQ returned a cross-cluster neighbor: ${pq.toSeq}")
    // ...and fine ranking should still overlap exact top-5 substantially.
    val recall = (brute intersect pq.toSet).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ recall too low on clustered data: $recall")
  }

  test("refined top-k (PQ shortlist + exact re-rank) matches brute force") {
    val emb = clustered
    val queries = emb.filter($"vec_id" % 20 === 9)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // Coarse codebooks (m=4 → 4-dim subspaces) so raw ADC ranking WITHIN
    // a cluster is degenerate — the regime the refine step exists for: a
    // shortlist covering the cluster (20 members) re-ranked exactly must
    // recover the full brute top-5.
    val cb = Pq.train(emb, m = 4, ksub = 8, iters = 2)
    val refined = Pq.topKRefined(emb, queries, cb, k = 5, shortlist = 30)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(refined == brute,
      s"refined != brute: missing=${brute -- refined} extra=${refined -- brute}")
  }

  test("planted same-direction copy ties the maximal ADC score") {
    val emb = clustered
    val queries = emb.filter($"vec_id" === 9L)
    val plant = queries.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.1f)).as("embedding"))
    val corpus = emb.union(plant)
    val cb = Pq.train(emb, m = 8, ksub = 16, iters = 2)
    // positive scaling preserves the normalized vector → identical codes
    // → the plant's ADC score EQUALS the best achievable score (nearby
    // corpus vectors may quantize to the same codes and tie, so rank is
    // not the invariant — the score is).
    val best = Pq.topK(corpus, queries, cb, k = 1)
      .collect().head.getAs[Double]("score")
    val plantScore = Pq.topK(plant, queries, cb, k = 1)
      .collect().head.getAs[Double]("score")
    assert(math.abs(plantScore - best) < 1e-9,
      s"plant ($plantScore) does not tie the max score ($best)")
  }

  test("IVF x PQ: cell pruning + codes, same-cluster recall holds") {
    val emb = clustered
    val queries = emb.filter($"vec_id" % 20 === 9)
    val cb = Pq.train(emb, m = 8, ksub = 16, iters = 3)
    val got = Pq.ivfPqTopK(emb, queries, cb, k = 5, nlist = 10, nprobe = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    assert(got.nonEmpty)
    assert(got.forall { case (q, v) => v / 20 == q / 20 },
      s"IVFPQ returned a cross-cluster neighbor: ${got.toSeq}")
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect got.toSet).size.toDouble / brute.size
    assert(recall >= 0.4, s"IVFPQ recall too low: $recall")
  }

  test("IVF x PQ plan: cell equi-join + bounded agg, no cartesian/window") {
    val emb = clustered
    val cb = Pq.train(emb, m = 4, ksub = 8, iters = 1)
    val plan = Pq.ivfPqTopK(emb, emb.filter($"vec_id" === 9L), cb,
      k = 3, nlist = 8, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
    assert(!plan.contains("Window"))
    assert(plan.contains("topk_by_score"))
    assert("Exchange".r.findAllIn(plan).size <= 3,
      s"too many exchanges:\n$plan")
  }

  test("PQ plan: no cartesian, no window funnel, bounded agg") {
    val emb = clustered
    val cb = Pq.train(emb, m = 4, ksub = 8, iters = 1)
    val plan = Pq.topK(emb, emb.filter($"vec_id" === 0L), cb, k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
    assert(!plan.contains("Window"))
    assert(plan.contains("topk_by_score"))
  }
}
