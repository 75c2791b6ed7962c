package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Quote- and paren-aware list split (reference: formatting.py:96-131).
  *
  * Splits on top-level commas after optionally rewriting `;` and the
  * separators " et " / " and " into commas; quoted segments (single or
  * double) and parenthesized groups are never split and surrounding quotes
  * are removed. NULL input yields an empty array.
  *
  * This is an eval-based custom Catalyst expression (CodegenFallback):
  * string tokenization is inherently row-wise, and this is not a hot-path
  * operator at scale.
  */
case class FormatList(
    child: Expression,
    replaceSemicolons: Boolean = true,
    replaceAnds: Boolean = true)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) null else v.toString
    val parts = FormatList.parse(s, replaceSemicolons, replaceAnds)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): FormatList =
    copy(child = newChild)

  override def prettyName: String = "format_list"
}

object FormatList {

  private def unquote(s: String): String =
    if (s.length >= 2 && (s.head == '"' || s.head == '\'') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  /** Pure tokenizer, also used directly by unit tests. */
  def parse(
      input: String,
      replaceSemicolons: Boolean,
      replaceAnds: Boolean): Seq[String] = {
    if (input == null) return Seq.empty
    var value = input.trim
    if (replaceSemicolons) value = value.replace(";", ", ")
    if (replaceAnds)
      value = value.replace(" et ", ", ").replace(" and ", ", ")

    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    value.foreach { ch =>
      if (quote != 0) {
        cur += ch
        if (ch == quote) quote = 0
      } else ch match {
        case '\'' | '"' =>
          quote = ch; cur += ch
        case '(' =>
          depth += 1; cur += ch
        case ')' =>
          if (depth > 0) depth -= 1
          cur += ch
        case ',' if depth == 0 =>
          out += cur.toString; cur.clear()
        case c =>
          cur += c
      }
    }
    out += cur.toString
    out.iterator.map(s => unquote(s.trim)).filter(_.nonEmpty).toSeq
  }
}
