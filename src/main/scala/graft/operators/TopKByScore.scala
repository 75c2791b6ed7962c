package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k by (score desc, id asc) as a hash aggregate.
  *
  * This is the distributed shape for "top k per group": the buffer is a
  * fixed k-slot insertion list, partial aggregation runs map-side, so the
  * exchange carries at most k rows per group per partition — versus the
  * `row_number().over(Window.partitionBy(group))` formulation, which
  * shuffles EVERY candidate row of a group into one task (the whole corpus
  * per query, for brute-force ANN).
  *
  * Duplicate ids are collapsed on insert (same id ⇒ same underlying vector
  * ⇒ same score), which lets multi-probe candidate generation skip its
  * dropDuplicates exchange.
  *
  * Output: array<struct<id:long, score:double>> sorted best-first; explode
  * with posexplode for (rank-1, entry) pairs.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buf]
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(k)

  override def update(buf: TopKByScore.Buf, input: InternalRow)
      : TopKByScore.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKByScore.Buf, b: TopKByScore.Buf)
      : TopKByScore.Buf = {
    var i = 0
    while (i < b.size) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKByScore.Buf): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      out(i) = new GenericInternalRow(
        Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Buf(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val id = bb.getLong
      buf.insert(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** k-slot insertion list ordered (score desc, id asc); duplicate ids are
    * ignored (an id that was evicted can never re-qualify with the same
    * score, so a linear containment check is exact dedup). */
  final class Buf(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    def insert(s: Double, id: Long): Unit = {
      var i = 0
      while (i < size) { if (ids(i) == id) return; i += 1 }
      if (size < k) {
        var pos = size
        while (pos > 0 && worseThan(pos - 1, s, id)) {
          scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        scores(pos) = s; ids(pos) = id; size += 1
      } else if (worseThan(k - 1, s, id)) {
        var pos = k - 1
        while (pos > 0 && worseThan(pos - 1, s, id)) {
          scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        scores(pos) = s; ids(pos) = id
      }
    }

    /** Is slot `i` strictly worse than candidate (s, id)? */
    private def worseThan(i: Int, s: Double, id: Long): Boolean =
      scores(i) < s || (scores(i) == s && ids(i) > id)
  }
}
