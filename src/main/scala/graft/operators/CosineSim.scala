package graft.operators

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity between two float-array columns in one tight loop.
  *
  * The built-in composition (zip_with + aggregate ×3) is interpreted
  * (HigherOrderFunction has no codegen) and walks both arrays four times
  * with boxing; this walks them once. Null/zero vectors → 0.0.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  // Declared input types make SQL/Scala misuse safe: the analyzer inserts
  // casts (e.g. array<double> → array<float>) or fails analysis instead
  // of the eval crashing on a mistyped ArrayData at runtime.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) return java.lang.Double.valueOf(0.0)
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = av.getFloat(i).toDouble
      val y = bv.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
