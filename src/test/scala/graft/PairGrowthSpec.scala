package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Candidate-pair LINEARITY for the near-dup family — the sf1 scale
  * adjudication (r12 verdict task 6) made a spec. The steep sf1 rows
  * (`embed_dups` 4.14×, `dedup_minhash` 3.58× under 10× data) were
  * claimed density-driven, not table-squared; this pins the mechanism:
  *
  *  - MinHash banding's candidate pairs on a DUP-FREE corpus are ~0
  *    and grow ≤ c·N — band hashes are content hashes, so distinct
  *    documents collide with vanishing probability. Every observed
  *    pair-stage growth is therefore PLANTED/REAL dup density, which
  *    is the work any dedup must do.
  *  - Hyperplane bucketing's pairs on a dup-free corpus are
  *    ~N²/2^planes BY CONSTRUCTION — fixed planes are quadratic in N
  *    (the spec demonstrates it), and the scale discipline is planes ~
  *    log2(N): re-bucketing 10× the vectors under +4 planes holds
  *    pairs to ~linear growth (also demonstrated). RECALL.md carries
  *    the operator guidance.
  */
class PairGrowthSpec extends SparkSpec {
  import spark.implicits._

  /** Sum of C(n_b, 2) over buckets: the exact number of candidate
    * pairs the bucketed self-join generates, computed without
    * materializing the join. */
  private def candidatePairs(bucketed: DataFrame,
      keys: Seq[String]): Long =
    bucketed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(sum(col("n") * (col("n") - 1) / 2).cast("long"))
      .head().getLong(0)

  /** Dup-free corpus: each doc is its own random token stream (seeded,
    * vocabulary large enough that 3-gram shingle overlap is noise). */
  private def corpus(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, Seq.fill(20)("w" + rnd.nextInt(200000)).mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def vectors(n: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("minhash banding: dup-free candidate pairs grow at most " +
      "linearly under 10x data") {
    val n1 = 2000
    val p1 = candidatePairs(
      Dedup.bandIndex(corpus(n1, 11L)), Seq("band", "bh"))
    val p10 = candidatePairs(
      Dedup.bandIndex(corpus(10 * n1, 12L)), Seq("band", "bh"))
    // the linear budget: c·N with a generous c; random-content band
    // collisions are so rare both counts sit near zero, far under it
    assert(p1 <= n1,
      s"dup-free 1x corpus produced $p1 candidate pairs (> c*N)")
    assert(p10 <= 10L * n1,
      s"dup-free 10x corpus produced $p10 candidate pairs (> c*10N) — " +
        "the pair stage is growing super-linearly on content-free data")
  }

  test("hyperplane bucketing: fixed planes are quadratic by " +
      "construction; planes ~ log2(N) holds pairs ~linear") {
    val n1 = 2000
    val v1 = vectors(n1, 21L)
    val v10 = vectors(10 * n1, 22L)
    def pairsOf(v: DataFrame, planes: Int): Long = candidatePairs(
      v.select(Similarity.hyperplaneBucket(col("embedding"), planes)
        .as("bucket")), Seq("bucket"))
    val p1 = pairsOf(v1, 6)
    val p10Fixed = pairsOf(v10, 6)
    val p10Scaled = pairsOf(v10, 6 + 4) // +log2(10) rounded up
    // fixed planes: ~uniform buckets → pairs ≈ N²/2^planes; 10× data
    // must show the quadratic (≫10×) growth — this PIN documents why
    // plane count is a scale knob, not a constant
    assert(p10Fixed > 20L * p1,
      s"expected quadratic growth under fixed planes, got $p1 -> " +
        s"$p10Fixed — if this starts failing the bucketing changed")
    // scaled planes: bucket occupancy restored → ~linear pair growth
    assert(p10Scaled <= 20L * p1 + 10L * n1,
      s"planes ~ log2(N) must hold pairs ~linear: 1x=$p1 (6 planes), " +
        s"10x=$p10Scaled (10 planes)")
  }

  test("autoPlanes default: 10x corpus under the DEFAULT holds " +
      "candidate pairs <= c*N with no recall drop on planted pairs") {
    // the r13 carry: the discipline above existed only as operator
    // guidance — cosineDups took a fixed `planes` the caller had to
    // re-tune per scale. The default now derives planes = ceil(log2 N)
    // - 4 from one corpus count; this pins BOTH halves of the
    // contract at 1x and 10x.
    val n1 = 2000
    def planted(v: DataFrame): DataFrame = v.union(
      v.filter(col("vec_id") % 20 === 0).select(
        (col("vec_id") + 10000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.1f))
          .as("embedding")))
    Seq((n1, 31L), (10 * n1, 32L)).foreach { case (n, seed) =>
      val v = planted(vectors(n, seed))
      val total = v.count()
      val p = Similarity.autoPlanes(total)
      assert(p == math.max(4, math.ceil(
        math.log(total.toDouble) / math.log(2.0)).toInt - 4))
      // pair budget: the default's bucket count holds candidates ≤
      // c·N (c = 2^4 = 16 expected same-bucket partners, doubled for
      // headroom — gaussian buckets are not perfectly uniform)
      val pairs = candidatePairs(
        v.select(Similarity.hyperplaneBucket(col("embedding"), p)
          .as("bucket")), Seq("bucket"))
      assert(pairs <= 32L * total,
        s"N=$total default planes=$p produced $pairs candidate " +
          "pairs (> 2c*N) — the auto default lost linearity")
      // recall: every planted scaled copy is recovered (sign patterns
      // are scale-invariant — plants always share their original's
      // bucket at ANY plane count)
      val dups = Similarity.cosineDups(v, threshold = 0.999)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (1 to n).filter(_ % 20 == 0)
        .map(i => (i.toLong, i + 10000000L)).toSet
      assert(dups == want,
        s"N=$total: auto-default recall broke — got ${dups.size} " +
          s"pairs, want ${want.size}")
    }
  }
}
