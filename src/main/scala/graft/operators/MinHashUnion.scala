package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregates per-document MinHash signatures into the signature of the
  * UNION of the group's shingle sets (element-wise min — the defining
  * property of min-hash makes this exact, not an approximation of the
  * union signature).
  *
  * Use: corpus-level similarity triage — e.g. signature per `source`
  * domain, then estimated Jaccard between sources = fraction of equal
  * signature slots. A TypedImperativeAggregate with a fixed
  * `numHashes × 8`-byte buffer: constant state per group, partial
  * aggregation (map-side combine) works as usual.
  */
case class MinHashUnion(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(java.lang.Long.valueOf(_)).toArray[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnion =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_union"
}
