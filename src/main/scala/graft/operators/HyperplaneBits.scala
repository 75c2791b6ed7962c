package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH fingerprint of a float vector: bit p is the sign
  * of the dot product with hyperplane p, whose ±1 weights are derived
  * deterministically from splitmix64(p, dim). All `planes` projections are
  * computed in one pass over the vector (the zip_with/aggregate
  * composition was interpreted per plane).
  */
case class HyperplaneBits(child: Expression, planes: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val proj = new Array[Double](planes)
    var i = 0
    while (i < arr.numElements()) {
      val x = arr.getFloat(i).toDouble
      var p = 0
      while (p < planes) {
        val w =
          if ((MinHashSig.mix64((p.toLong << 32) | i.toLong) & 1L) == 0L) x
          else -x
        proj(p) += w
        p += 1
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0) out |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBits = copy(child = newChild)

  override def prettyName: String = "hyperplane_bits"
}
