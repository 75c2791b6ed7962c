package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
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
    val scored = c.join(probes, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Lloyd iterations for IVF centroids, in pure DataFrame ops: assign
    * each vector to its nearest centroid (broadcast), then recompute each
    * centroid as the element-wise mean of its cell (posexplode → per-dim
    * avg → re-assemble). Deterministic init: first k vectors by vec_id.
    * Each iteration is one broadcast pass + one (cell, dim) aggregate.
    */
  def trainCentroids(
      corpus: DataFrame,
      k: Int,
      iters: Int = 3): DataFrame = {
    var centroids = corpus.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    var i = 0
    while (i < iters) {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("_csim").desc, col("cid"))
      val assigned = corpus.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(centroids))
        .withColumn("_csim", cosine(col("embedding"), col("cemb")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("cid"), col("embedding"))
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
    * (a broadcast of the tiny centroid table — per-row cost is nlist
    * cosines, never a data×data join); queries probe their `nprobe`
    * nearest cells and rank candidates by exact cosine within those cells.
    * The candidate join is an equi-join on the cell id.
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

    def assign(df: DataFrame, idCol: String, embCol: String, topCells: Int)
        : DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("_csim").desc, col("cid"))
      df.crossJoin(broadcast(centroids))
        .withColumn("_csim", cosine(col(embCol), col("cemb")))
        .withColumn("_crn", row_number().over(w))
        .filter(col("_crn") <= topCells)
        .drop("_csim", "_crn", "cemb")
    }

    val cells = assign(
      corpus.select(col("vec_id"), col("embedding").as("emb")),
      "vec_id", "emb", 1)
    val qcells = assign(
      queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qemb")),
      "query_id", "qemb", nprobe)

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cells.join(qcells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("emb"), col("qemb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, generated via
    * LSH buckets (no all-pairs). */
  def cosineDups(
      corpus: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(
      col("vec_id"), col("embedding").as("emb"),
      hyperplaneBucket(col("embedding"), planes).as("bucket"))
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
}
