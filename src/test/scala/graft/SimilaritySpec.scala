package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs: DataFrame = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(1.0f, 0.05f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine similarity basics") {
    val df = Seq((Array(1.0f, 0f), Array(1.0f, 0f)),
      (Array(1.0f, 0f), Array(0f, 1.0f)),
      (Array(0f, 0f), Array(1.0f, 0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).collect()
      .map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(got(2) == 0.0) // zero vector guard
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val top = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" === 1), k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("vec_id")).toSeq == Seq(5L, 2L))
    assert(top.forall(_.getAs[Long]("query_id") == 1L))
  }

  test("LSH top-k finds the near neighbors for clustered vectors") {
    // 1, 2, 5 point in nearly the same direction → same bucket with high
    // probability under any hyperplane set; assert the bucket join returns
    // their mutual neighbors.
    val got = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 1),
      k = 2, planes = 4).collect()
    val ids = got.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.subsetOf(Set(2L, 5L)) && ids.nonEmpty)
  }

  test("LSH plan is a bucketed equi-join, not a cartesian product") {
    val plan = Similarity.lshTopK(vecs, vecs, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"plan had cartesian:\n$plan")
  }

  test("cosineDups surfaces near-identical embedding pairs") {
    val pairs = Similarity.cosineDups(vecs, threshold = 0.99, planes = 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH recall on clustered vectors (where LSH is meant to work)") {
    // 10 well-separated cluster directions in 16d, 20 members each with a
    // small deterministic perturbation on a second axis.
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 3) % dim) = 0.05f * ((c * 20 + m) % 5)
      ((c * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 20 === 0) // one per cluster
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 5, planes = 6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall too low on clustered data: $recall")
  }

  test("IVF top-k recalls clustered neighbors") {
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 3) % dim) = 0.05f * ((c * 20 + m) % 5)
      ((c * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 20 === 7)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nlist = 12, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall too low on clustered data: $recall")
  }

  test("multi-probe LSH recall >= single-probe on clustered vectors") {
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 3) % dim) = 0.05f * ((c * 20 + m) % 5)
      ((c * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 20 === 3)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val single = recall(Similarity.lshTopK(emb, queries, k = 5, planes = 8))
    val multi = recall(
      Similarity.lshTopKMultiProbe(emb, queries, k = 5, planes = 8))
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi >= 0.5, s"multi-probe recall too low: $multi")
  }

  test("trained IVF centroids: recall >= deterministic-init IVF") {
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 5) % dim) = 0.04f * ((c * 20 + m) % 5)
      ((c * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 20 === 11)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val trained = Similarity.trainCentroids(emb, k = 10, iters = 2)
    assert(trained.count() <= 10)
    val plain = recall(Similarity.ivfTopK(emb, queries, k = 5,
      nlist = 10, nprobe = 3))
    val withTrained = recall(Similarity.ivfTopK(emb, queries, k = 5,
      nlist = 10, nprobe = 3, trainedCentroids = Some(trained)))
    assert(withTrained >= plain - 0.2,
      s"trained=$withTrained plain=$plain")
    assert(withTrained >= 0.5, s"trained recall too low: $withTrained")
  }

  test("top-k plans: bounded agg, no per-query window funnel") {
    // The final ranking must be a hash aggregate (partial top-k map-side),
    // not row_number over Window.partitionBy(query_id) — the window form
    // funnels every scored candidate of a query into a single task.
    for (df <- Seq(
        Similarity.bruteTopK(vecs, vecs.filter($"vec_id" === 1), k = 2),
        Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 1), k = 2),
        Similarity.lshTopKMultiProbe(vecs, vecs.filter($"vec_id" === 1), 2),
        Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 1), k = 2,
          nlist = 2, nprobe = 1))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window funnel in plan:\n$plan")
      assert(plan.contains("topk_by_score"), s"no bounded agg in:\n$plan")
    }
  }

  test("IVF assignment is shuffle-free (no exchange between scan and join)") {
    // Centroid assignment rides in a literal-embedded expression: the only
    // exchanges in the whole plan are the cell-id join and the final
    // bounded top-k aggregate; the old crossJoin+window form added a
    // corpus×nlist exchange. (One join + one agg = at most 3 exchanges;
    // no cartesian, no window.)
    val df = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 1), k = 2,
      nlist = 2, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"$exchanges exchanges in IVF plan:\n$plan")
  }

  test("TopKByScore dedups ids and honors (score desc, id asc) ties") {
    import graft.operators.TopKByScore
    val buf = new TopKByScore.Buf(3)
    buf.insert(0.5, 7L); buf.insert(0.5, 3L); buf.insert(0.5, 7L)
    buf.insert(0.9, 1L); buf.insert(0.5, 2L)
    assert(buf.size == 3)
    assert(buf.ids.toSeq == Seq(1L, 2L, 3L))
    assert(buf.scores.toSeq == Seq(0.9, 0.5, 0.5))
    // an evicted id never re-qualifies at the same score
    buf.insert(0.5, 7L)
    assert(buf.ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("k-means|| centroids cover every cluster (deterministic)") {
    val dim = 16
    val rows = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = new Array[Float](dim)
      v(c) = 1.0f
      v((c + 3) % dim) = 0.01f * m
      ((c * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansParCentroids(emb, k = 10, rounds = 3)
    val collected = cents.collect().map(_.getSeq[Float](1))
    assert(collected.length == 10)
    // every cluster direction must have a centroid with high cosine —
    // the coverage guarantee d²-weighted sampling provides.
    for (c <- 0 until 10) {
      val best = collected.map { cent =>
        // cosine with the cluster axis = normalized component c
        val n = math.sqrt(cent.map(x => x.toDouble * x).sum)
        if (n == 0) 0.0 else cent(c) / n
      }.max
      assert(best > 0.8, s"cluster $c uncovered (best cos $best)")
    }
    // deterministic: second run bit-identical
    val again = Similarity.kmeansParCentroids(emb, k = 10, rounds = 3)
      .collect().map(_.getSeq[Float](1))
    assert(collected.map(_.toList).toList == again.map(_.toList).toList)
    // and IVF search with these centroids reaches good recall
    val queries = emb.filter($"vec_id" % 20 === 13)
    val brute = Similarity.bruteTopK(emb, queries, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nlist = 10,
      nprobe = 3, trainedCentroids = Some(cents)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall with kmeans|| centroids: $recall")
  }

  test("testdata embeddings: brute + LSH run end-to-end, no cartesian") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" % 100 === 0)
    assert(Similarity.bruteTopK(emb, queries, k = 3).count() > 0)
    val lsh = Similarity.lshTopK(emb, queries, k = 3, planes = 4)
    assert(!lsh.queryExecution.executedPlan.toString.contains("Cartesian"))
    lsh.count() // executes
  }

  test("semDedup: transitive components canonicalize to min id; " +
      "no cartesian") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    // TWO scaled copies of each planted original: the pair (copy1, copy2)
    // is also cosine-1.0, so the component {orig, c1, c2} exercises the
    // transitive closure, and the min id (the original) must win for all
    val plants = emb.filter($"vec_id" % 50 === 0)
    val c1 = plants.select(($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.1f)).as("embedding"))
    val c2 = plants.select(($"vec_id" + 2000000L).as("vec_id"),
      transform($"embedding", x => x * lit(1.3f)).as("embedding"))
    val corpus = emb.union(c1).union(c2)
    val res = Similarity.semDedup(corpus, threshold = 0.999, nlist = 8)
    assert(!res.queryExecution.executedPlan.toString.contains("Cartesian"),
      "pair generation must be a cell equi-join, not all-pairs")
    val assign = res.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val origs = plants.collect().map(_.getLong(0))
    assert(origs.nonEmpty)
    origs.foreach { o =>
      assert(assign(o) == o, s"original $o must keep itself")
      assert(assign(o + 1000000L) == o, s"copy1 of $o must canonicalize")
      assert(assign(o + 2000000L) == o, s"copy2 of $o must canonicalize")
    }
    // every row assigned exactly once; non-planted vectors keep themselves
    assert(assign.size == corpus.count())
    val plantedIds = origs.toSet
    assign.foreach { case (id, canon) =>
      if (id < 1000000L && !plantedIds.contains(id))
        assert(canon == id, s"non-dup $id must keep itself, got $canon")
    }
  }
}
