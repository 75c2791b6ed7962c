package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Top-`topCells` nearest IVF centroids (by cosine) of a float vector, in
  * one pass with ZERO shuffle.
  *
  * The centroid table is tiny by construction (nlist entries), so it rides
  * into the expression as a literal: per row the cost is nlist fused
  * dot-products and a bounded insertion into a topCells-sized buffer. This
  * replaces the earlier crossJoin(broadcast) + row_number() window, whose
  * ranking step shuffled a corpus×nlist exploded relation — the difference
  * between zero exchanges and a 4096× data exchange at 100 TB.
  *
  * Ties break on the lower centroid id (matching the window's
  * `orderBy(csim.desc, cid)` it replaces). Null input → null.
  *
  * `cids`/`cents` are Seqs (not raw arrays) so case-class equality — and
  * therefore Catalyst semanticEquals / subexpression elimination — stays
  * structural; eval hot-loops run over unboxed copies.
  */
case class NearestCells(
    child: Expression,
    cids: IndexedSeq[Long],
    cents: IndexedSeq[IndexedSeq[Float]],
    topCells: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  require(cids.length == cents.length && cids.nonEmpty,
    "centroid ids and vectors must align and be non-empty")
  require(topCells >= 1 && topCells <= cids.length,
    s"topCells must be in [1, ${cids.length}], got $topCells")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val ids: Array[Long] = cids.toArray
  @transient private lazy val vecs: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      v(i) = x
      vn += x * x
      i += 1
    }
    vn = math.sqrt(vn)

    // Bounded insertion sort over (cosine desc, cid asc) — topCells is
    // small (1..nprobe), so this beats a heap on constants.
    val bestSim = Array.fill(topCells)(Double.NegativeInfinity)
    val bestCid = new Array[Long](topCells)
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * cv(j); j += 1 }
      val sim =
        if (vn == 0.0 || norms(c) == 0.0) 0.0 else dot / (vn * norms(c))
      val cid = ids(c)
      if (sim > bestSim(topCells - 1) ||
          (sim == bestSim(topCells - 1) && cid < bestCid(topCells - 1))) {
        var k = topCells - 1
        while (k > 0 && (bestSim(k - 1) < sim ||
            (bestSim(k - 1) == sim && bestCid(k - 1) > cid))) {
          bestSim(k) = bestSim(k - 1)
          bestCid(k) = bestCid(k - 1)
          k -= 1
        }
        bestSim(k) = sim
        bestCid(k) = cid
      }
      c += 1
    }
    new GenericArrayData(bestCid)
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCells = copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}
