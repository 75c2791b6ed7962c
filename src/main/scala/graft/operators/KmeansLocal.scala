package graft.operators

/** Driver-side weighted k-means over the TINY k-means|| candidate set
  * (≤ 1 + rounds·l points): deterministic farthest-point seeding followed
  * by weighted Lloyd iterations. Pure Scala — this never sees corpus-scale
  * data, only the collected candidates. */
object KmeansLocal {

  /** Returns k centers (unit-ish vectors) for weighted candidates. */
  def weighted(
      cands: IndexedSeq[IndexedSeq[Float]],
      w: Array[Double],
      k: Int,
      iters: Int): IndexedSeq[IndexedSeq[Float]] = {
    require(cands.nonEmpty, "no candidates")
    val xs = cands.map(_.toArray).toArray
    val n = xs.length
    val dim = xs(0).length
    val kk = math.min(k, n)

    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }

    // Farthest-point seeding, weight-scaled (deterministic; start from
    // the heaviest candidate, tie → lowest index).
    val centers = new Array[Array[Float]](kk)
    var heaviest = 0
    var i = 1
    while (i < n) { if (w(i) > w(heaviest)) heaviest = i; i += 1 }
    centers(0) = xs(heaviest).clone()
    val minD2 = Array.tabulate(n)(j => d2(xs(j), centers(0)))
    var c = 1
    while (c < kk) {
      var best = 0
      var bestScore = -1.0
      var j = 0
      while (j < n) {
        val score = w(j) * minD2(j)
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      centers(c) = xs(best).clone()
      j = 0
      while (j < n) {
        val d = d2(xs(j), centers(c))
        if (d < minD2(j)) minD2(j) = d
        j += 1
      }
      c += 1
    }

    // Weighted Lloyd.
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](kk, dim)
      val wsum = new Array[Double](kk)
      var j = 0
      while (j < n) {
        var bestC = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < kk) {
          val d = d2(xs(j), centers(cc))
          if (d < bestD) { bestD = d; bestC = cc }
          cc += 1
        }
        val wj = w(j)
        var p = 0
        while (p < dim) { sums(bestC)(p) += wj * xs(j)(p); p += 1 }
        wsum(bestC) += wj
        j += 1
      }
      var cc = 0
      while (cc < kk) {
        if (wsum(cc) > 0) {
          var p = 0
          while (p < dim) {
            centers(cc)(p) = (sums(cc)(p) / wsum(cc)).toFloat
            p += 1
          }
        }
        cc += 1
      }
      it += 1
    }
    centers.map(_.toIndexedSeq).toIndexedSeq
  }
}
