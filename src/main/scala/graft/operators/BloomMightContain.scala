package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built [[BloomFilter]], embedded in
  * the plan as serialized bits (the same literal-embedding pattern as
  * [[graft.operators.NearestCells]]: the sketch ships with the task
  * closure once per stage, no join and no shuffle to consult it).
  * `mightContain` may yield false POSITIVES (callers must exact-verify
  * candidates) but never false negatives. Deserialized lazily once per
  * task, not per row.
  */
case class BloomMightContain(child: Expression, filterBits: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBits))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bf.mightContainString(v.toString)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)

  // Case-class equality on Array[Byte] is reference equality, under which
  // two expressions carrying identical filters never compare equal — so
  // semanticEquals and common-subexpression elimination could not
  // deduplicate repeated probes. Compare the bits by content.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(filterBits, b.filterBits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBits)

  override def prettyName: String = "bloom_might_contain"
}
