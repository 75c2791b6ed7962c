package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k with the QUERY side broadcast —
  *    correct baseline; cost is |corpus| × |queries|, so only usable when
  *    the query set is small (it is broadcast, never shuffled).
  *  - [[lshTopK]]: random-hyperplane LSH — corpus and queries are bucketed
  *    by sign-bit fingerprints and joined per bucket, so candidate
  *    generation is an equi-join shuffle on the bucket key, never a cross
  *    join. The scale path for 100 TB corpora.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (single-pass
    * custom expression — see [[CosineSim]]). Null/zero vectors → 0.0. */
  def cosine(a: Column, b: Column): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(CosineSim(B.expression(a), B.expression(b)))
  }

  /** Final per-query ranking of scored candidates as a BOUNDED hash
    * aggregate ([[TopKByScore]]): map-side partials carry at most k rows
    * per (query, partition) into the exchange — versus the earlier
    * `row_number().over(Window.partitionBy(query_id))`, which funneled
    * every scored candidate of a query into one task (for brute force,
    * the entire corpus). Expects columns query_id and vec_id; `scoreCol`
    * names BOTH the input score column and the output column (the PQ
    * paths use "score", the cosine paths the default). */
  private[operators] def rankTopK(
      scored: DataFrame, k: Int, scoreCol: String = "cosine"): DataFrame = {
    val B = org.apache.spark.sql.graft.Bridge
    val topk = B.column(TopKByScore(
      B.expression(col(scoreCol)), B.expression(col("vec_id")), k)
      .toAggregateExpression())
    scored.groupBy("query_id").agg(topk.as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r0", "e")))
      .select(col("query_id"), col("e.id").as("vec_id"),
        col("e.score").as(scoreCol),
        (col("r0") + 1).cast(IntegerType).as("rank"))
  }

  /** Exact brute-force top-k: for each query row, the k nearest corpus rows
    * by cosine (excluding self-matches on vec_id). Deterministic tiebreak
    * on vec_id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5)
      : DataFrame = {
    val c = corpus.select(
      col("vec_id").as("vec_id"), col("embedding").as("emb"))
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
    rankTopK(scored, k)
  }

  /** Sign-bit fingerprint: bit p = sign of <v, w_p> where hyperplane w_p
    * has deterministic pseudo-random ±1 weights (see [[HyperplaneBits]];
    * one pass over the vector for all planes). */
  def hyperplaneBucket(v: Column, planes: Int): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(HyperplaneBits(B.expression(v), planes))
  }

  /** LSH-bucketed approximate top-k: candidates are corpus rows in the same
    * hyperplane bucket as the query; exact cosine ranks within bucket.
    * Fewer planes → bigger buckets → better recall, more compute. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(
      col("vec_id"), col("embedding").as("emb"),
      hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qemb"),
      hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val scored = c.join(q, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
    rankTopK(scored, k)
  }

  /** Multi-probe LSH top-k: the query side also probes every bucket at
    * Hamming distance 1 from its own fingerprint (planes+1 probes/query) —
    * the standard recall boost without growing buckets. Corpus cost is
    * unchanged; the join stays a bucket equi-join.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(
      col("vec_id"), col("embedding").as("emb"),
      hyperplaneBucket(col("embedding"), planes).as("bucket"))
    val q0 = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qemb"),
      hyperplaneBucket(col("embedding"), planes).as("b0"))
    val probes = q0.select(
      col("query_id"), col("qemb"),
      explode(array(
        (col("b0") +: (0 until planes).map(p =>
          col("b0").bitwiseXOR(lit(1L << p)))): _*)).as("bucket"))
    // No dropDuplicates: [[TopKByScore]] collapses duplicate vec_ids from
    // overlapping probes inside the aggregation buffer — one exchange
    // fewer than a distinct-then-rank plan.
    val scored = c.join(probes, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
    rankTopK(scored, k)
  }

  /** Collect the tiny (nlist-row) centroid table driver-side so nearest-
    * cell assignment can run as a literal-embedded expression. This is the
    * legitimate small-side collect — same size class as a broadcast dim
    * table (nlist × dim floats; 4096 × 1024 ≈ 16 MB worst case). */
  def collectCentroids(centroids: DataFrame)
      : (IndexedSeq[Long], IndexedSeq[IndexedSeq[Float]]) = {
    val rows = centroids.select(col("cid"), col("cemb")).collect()
    (rows.map(_.getLong(0)).toIndexedSeq,
      rows.map(_.getSeq[Float](1).toIndexedSeq).toIndexedSeq)
  }

  /** Top-`topCells` nearest centroid ids of an embedding column — one
    * zero-shuffle pass per row (see [[NearestCells]]). */
  def nearestCells(
      emb: Column,
      cids: IndexedSeq[Long],
      cents: IndexedSeq[IndexedSeq[Float]],
      topCells: Int): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(NearestCells(B.expression(emb), cids, cents, topCells))
  }

  /** Per-row max cosine against a literal-embedded centroid set (zero
    * shuffle; see [[MaxCosine]]). */
  def maxCosine(emb: Column, cents: IndexedSeq[IndexedSeq[Float]]): Column = {
    val B = org.apache.spark.sql.graft.Bridge
    B.column(MaxCosine(B.expression(emb), cents))
  }

  /** k-means|| initialization (Bahmani et al., VLDB 2012) for the IVF
    * coarse quantizer, fully deterministic:
    *
    *  1. seed with the min-hash vector;
    *  2. `rounds` passes, each sampling every point independently with
    *     probability `min(1, l·d²(x,C)/Σd²)` where d = 1 − maxcos —
    *     the uniform draw is `xxhash64(vec_id, round)` scaled to [0,1),
    *     so the run is reproducible with no RNG state;
    *  3. weight each candidate by the number of corpus points it is
    *     nearest to (one zero-shuffle [[NearestCells]] pass + a count);
    *  4. recluster the ≤ 1+rounds·l weighted candidates driver-side:
    *     deterministic farthest-point seeding + weighted Lloyd.
    *
    * Per round: one aggregate (Σd²) and one bounded collect — each a
    * full scan but ZERO shuffles; the candidate set stays driver-tiny.
    * Returns (cid, cemb) compatible with `ivfTopK(trainedCentroids=…)`.
    * Compared to the hash-spread seed sample, the d²-weighted rounds
    * guarantee coverage of small far-away clusters that a uniform sample
    * of k points can miss entirely.
    */
  def kmeansParCentroids(
      corpus: DataFrame,
      k: Int,
      rounds: Int = 3,
      oversample: Int = 0,
      lloydIters: Int = 5): DataFrame = {
    val l = if (oversample > 0) oversample else 2 * k
    val seed = corpus.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(1).select(col("embedding")).collect()
      .head.getSeq[Float](0).toIndexedSeq
    var cents: Vector[IndexedSeq[Float]] = Vector(seed)

    var t = 1
    while (t <= rounds) {
      val d = lit(1.0) - maxCosine(col("embedding"), cents)
      val d2 = d * d
      val total = corpus.agg(sum(d2)).head().getDouble(0)
      if (total > 0.0) {
        // deterministic uniform in [0,1): top 53 bits of xxhash64
        val u = shiftrightunsigned(
          xxhash64(col("vec_id"), lit(t)), 11).cast(DoubleType) /
          lit(9007199254740992.0) // 2^53
        val p = least(lit(1.0), lit(l.toDouble) * d2 / lit(total))
        // Bound the collect against adversarial d² skew; the cap picks
        // deterministically (hash order), not whichever partitions answer
        // first, so reruns stay bit-identical even when it binds.
        val picked = corpus.filter(u < p)
          .orderBy(xxhash64(col("vec_id"), lit(t)), col("vec_id"))
          .limit(8 * l)
          .select(col("embedding")).collect()
          .map(_.getSeq[Float](0).toIndexedSeq)
        cents = cents ++ picked
      }
      t += 1
    }

    // candidate weights: corpus points nearest to each candidate
    val candIds = cents.indices.map(_.toLong).toIndexedSeq
    val weights = corpus
      .select(element_at(
        nearestCells(col("embedding"), candIds, cents, 1), 1).as("cid"))
      .groupBy("cid").agg(count(lit(1)).as("w")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap

    val chosen = KmeansLocal.weighted(
      cents.map(Pq.normalize0), // unit vectors → Euclidean ≈ spherical
      cents.indices.map(i => weights.getOrElse(i, 0L).toDouble).toArray,
      k, lloydIters)

    val spark = corpus.sparkSession
    import spark.implicits._
    chosen.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray.toSeq) }
      .toDF("cid", "cemb")
      .select(col("cid"),
        col("cemb").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false))
          .as("cemb"))
  }

  /** Lloyd iterations for IVF centroids: assign each vector to its nearest
    * centroid with the zero-shuffle [[NearestCells]] expression (the
    * centroid table is collected per iteration — it is nlist rows, and
    * Lloyd's is inherently iterative), then recompute each centroid as the
    * element-wise mean of its cell (posexplode → per-dim avg →
    * re-assemble; the exploded rows collapse in the map-side partial
    * aggregate, so the shuffle is only nlist × dim per partition).
    * Deterministic but SPREAD init: first k vectors by xxhash64(vec_id) —
    * a reproducible pseudo-random sample (the first k ids outright can
    * all fall in one cluster and starve every other cell).
    */
  def trainCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int = 3): DataFrame = {
    var centroids = corpus.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    var i = 0
    while (i < iters) {
      val (cids, cents) = collectCentroids(centroids)
      val assigned = corpus.select(
        element_at(nearestCells(col("embedding"), cids, cents, 1), 1)
          .as("cid"),
        col("embedding"))
      centroids = assigned
        .select(col("cid"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cid"),
          transform(col("pm"), x => x.getField("m").cast("float"))
            .as("cemb"))
      i += 1
    }
    centroids
  }

  /** IVF (inverted-file) approximate top-k — the other classic scale path.
    *
    * Coarse quantizer: the first `nlist` corpus vectors by vec_id stand in
    * for k-means centroids (deterministic; swap in trained centroids for
    * production). Corpus rows are assigned to their nearest centroid cell
    * with the literal-embedded [[NearestCells]] expression — per-row cost
    * is nlist fused cosines, ZERO shuffle (no join, no window); queries
    * probe their `nprobe` nearest cells the same way. The only exchanges
    * in the plan are the candidate equi-join on the cell id and the final
    * per-query rank.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainedCentroids: Option[DataFrame] = None): DataFrame = {
    val centroids = trainedCentroids.getOrElse(
      corpus.orderBy("vec_id").limit(nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val (cids, cents) = collectCentroids(centroids)

    val cells = corpus.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("cid",
        element_at(nearestCells(col("emb"), cids, cents, 1), 1))
    val qcells = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qemb"))
      .withColumn("cid",
        explode(nearestCells(col("qemb"), cids, cents, nprobe)))

    // Each corpus vector lives in exactly one cell, so the nprobe cell
    // join is already duplicate-free per (query, vec).
    val scored = cells.join(qcells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
    rankTopK(scored, k)
  }

  /** Hyperplane count that keeps random-bucket candidate pairs LINEAR
    * in the corpus: uniform-ish vectors spread over 2^planes buckets
    * generate ~N²/2^planes pairs, so holding pairs ≤ c·N needs planes ≥
    * log₂(N) − log₂(c) — the re-bucketing discipline PairGrowthSpec
    * demonstrates (a FIXED plane count goes quadratic under growth).
    * c = 16 expected same-bucket partners; floor of 4 planes so tiny
    * corpora still split. */
  def autoPlanes(n: Long): Int =
    math.max(4, math.ceil(
      math.log(math.max(2L, n).toDouble) / math.log(2.0)).toInt - 4)

  /** Embedding-cosine near-duplicate pairs above a threshold, generated via
    * LSH buckets (no all-pairs). `planes < 0` (the default) self-scales
    * from one cheap corpus count: planes = ⌈log₂ N⌉ − 4
    * ([[autoPlanes]]), so candidate pairs stay ~linear as the corpus
    * grows instead of quadratic under a stale hand-tuned constant.
    * Recall note: MORE planes = smaller buckets = lower recall for
    * near-but-not-identical pairs (exact/scaled duplicates always
    * collide — sign patterns are scale-invariant); pass an explicit
    * plane count to trade compute for recall deliberately. */
  def cosineDups(
      corpus: DataFrame,
      threshold: Double = 0.95,
      planes: Int = -1,
      maxBucketSize: Int = 100000): DataFrame = {
    val p = if (planes >= 0) planes else autoPlanes(corpus.count())
    // Same skew guard as the text LSH joins (see Dedup.capBuckets): one
    // degenerate hyperplane bucket must not go quadratic.
    val c = Dedup.capBuckets(
      corpus.select(
        col("vec_id"), col("embedding").as("emb"),
        hyperplaneBucket(col("embedding"), p).as("bucket")),
      Seq("bucket"), maxBucketSize)
    val a = c.alias("a")
    val b = c.alias("b")
    a.join(b,
      col("a.bucket") === col("b.bucket")
        && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", cosine(col("a.emb"), col("b.emb")))
      .filter(col("cosine") >= threshold)
      .select(
        col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("cosine"))
  }

  /** SemDeDup (Abbas et al., 2023, arXiv:2303.09540): SEMANTIC dedup by
    * clustering the embedding space and comparing only within a cluster —
    * the published scale trick that makes embedding dedup tractable where
    * [[cosineDups]]' random-hyperplane buckets trade recall for speed:
    * k-means cells follow the data's own density, so semantically close
    * pairs share a cell by construction instead of by hash luck.
    *
    *   1. coarse centroids: trained (pass `trainedCentroids` from
    *      [[trainCentroids]] / [[kmeansParCentroids]]) or the
    *      deterministic hash-spread sample;
    *   2. every vector is assigned to its nearest centroid with the
    *      literal-embedded [[NearestCells]] expression — ZERO shuffle;
    *   3. candidate pairs are generated ONLY within a cell (slim
    *      equi-join on the cell id, skew-capped — never all-pairs);
    *   4. exact cosine keeps pairs >= threshold; the transitive closure
    *      (pointer-jumping fixpoint) assigns min-id canonical
    *      representatives.
    *
    * Returns (vec_id, canonical_id) for EVERY corpus row; rows with
    * `vec_id != canonical_id` are the semantic duplicates to drop.
    *
    * At 100 TB: assignment is zero-shuffle; the pair join shuffles the
    * slim (vec_id, cell, emb) relation once on the cell id; per-cell
    * work is bounded by `maxCellSize` (the same one-hot-bucket guard as
    * the LSH joins); the closure iterates on the EDGE set (near-dup
    * pairs), a tiny relation. Scale `nlist` with the corpus so cells
    * stay at a workable size (SemDeDup used 50k clusters for LAION). */
  def semDedup(
      corpus: DataFrame,
      threshold: Double = 0.95,
      nlist: Int = 16,
      trainedCentroids: Option[DataFrame] = None,
      maxCellSize: Int = 100000): DataFrame = {
    val centroids = trainedCentroids.getOrElse(
      corpus.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val (cids, cents) = collectCentroids(centroids)
    val cells = Dedup.capBuckets(
      corpus.select(
        col("vec_id"), col("embedding").as("emb"),
        element_at(nearestCells(col("embedding"), cids, cents, 1), 1)
          .as("cell")),
      Seq("cell"), maxCellSize)
    val a = cells.alias("a")
    val b = cells.alias("b")
    val pairs = a.join(b,
        col("a.cell") === col("b.cell")
          && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", cosine(col("a.emb"), col("b.emb")))
      .filter(col("cosine") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    Dedup.canonicalizeFixpoint(
        corpus.select(col("vec_id").as("doc_id")), pairs)
      .select(col("doc_id").as("vec_id"), col("canonical_id"))
  }
}
