package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Full MinHash signature (numHashes mins) over a document's word n-gram
  * shingles, computed from the raw text in ONE pass.
  *
  * Composing this from built-in higher-order functions costs numHashes
  * interpreted `transform` lambdas per row (Spark does not codegen
  * HigherOrderFunction) and re-evaluates the tokenization per element,
  * which dominated the dedup benchmark. Here the text is tokenized and
  * shingled once ([[TextNorm]]), each shingle string-hashed once (FNV-1a)
  * and re-mixed per hash slot with a splitmix64 finalizer —
  * O(shingles × numHashes) tight-loop long ops.
  */
case class MinHashSig(child: Expression, ngram: Int, numHashes: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) "" else v.toString
    val sh = TextNorm.shingles(TextNorm.tokenize(s), ngram)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val base = SimHash64.fnv1a64(sh(i))
      var h = 0
      while (h < numHashes) {
        val m = MinHashSig.mix64(base + 0x9E3779B97F4A7C15L * (h + 1))
        if (m < mins(h)) mins(h) = m
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
