package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Maximum cosine similarity between a float vector and a literal-embedded
  * centroid set, in one fused pass — the distance kernel k-means||
  * sampling needs (`d(x, C)² = (1 - maxcos)²` on the unit sphere), with
  * the same zero-shuffle shape as [[NearestCells]]. */
case class MaxCosine(
    child: Expression,
    cents: IndexedSeq[IndexedSeq[Float]])
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  require(cents.nonEmpty, "centroid set must be non-empty")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType

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
    var best = -1.0
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += v(j) * cv(j); j += 1 }
      val sim =
        if (vn == 0.0 || norms(c) == 0.0) 0.0 else dot / (vn * norms(c))
      if (sim > best) best = sim
      c += 1
    }
    java.lang.Double.valueOf(best)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MaxCosine = copy(child = newChild)

  override def prettyName: String = "max_cosine"
}
