package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared text normalization for the dedup family. */
object TextNorm {
  /** Lowercase, collapse non-alphanumerics to single spaces, split. */
  def tokenize(s: String): Array[String] = {
    if (s == null) return Array.empty
    val sb = new java.lang.StringBuilder(s.length)
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lc = Character.toLowerCase(c)
      if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
        sb.append(lc); prevSpace = false
      } else if (!prevSpace) {
        sb.append(' '); prevSpace = true
      }
      i += 1
    }
    val out = sb.toString.trim
    if (out.isEmpty) Array.empty else out.split(' ')
  }

  /** Word n-gram shingles; short docs fall back to one whole-text shingle. */
  def shingles(toks: Array[String], n: Int): Array[String] = {
    if (toks.length < n) return Array(toks.mkString(" "))
    val out = new Array[String](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }
}

/** text → array of word n-gram shingles in ONE pass (tokenize + n-gram in
  * a tight loop). The built-in composition (split + transform + slice +
  * concat_ws) re-evaluates the tokenization per array element when
  * interpreted, which made it O(tokens²) per document.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) "" else v.toString
    val sh = TextNorm.shingles(TextNorm.tokenize(s), n)
    new GenericArrayData(sh.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}
