package graft.operators

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rebuilds a token array as a space-joined string with every token whose
  * index falls inside any of `spans` removed — the cut-application step of
  * exact-substring dedup ([[Curate.dedupSubstrings]]).
  *
  * `left` is the token array (`array<string>`), `right` the cut spans as
  * an `array<struct<s:int, e:int>>` SORTED ascending by start (the plan
  * passes `array_sort(collect_set(...))`; struct ordering is
  * lexicographic, so sorting by `s` first is exactly what array_sort
  * gives). Spans may overlap — the walk below handles that without a
  * separate merge pass.
  *
  * One merge-walk over (tokens + spans): the span cursor only ever
  * advances (a span left behind has `e < i`, and `i` is monotone, so it
  * can never cover a later token; spans are start-sorted, so if the
  * cursor's span starts after `i`, every remaining span does too). This
  * replaces a per-token `array_contains` over the exploded cut-position
  * set — O(tokens × cuts) per document and k× more exchanged rows — with
  * O(tokens + spans): the difference between quadratic and linear on the
  * boilerplate-heavy long documents this operator exists for (§2's
  * interpreted-expression lesson applied to the HOF path).
  */
case class DropSpans(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(tokens: Any, spans: Any): Any = {
    val ts = tokens.asInstanceOf[ArrayData]
    val sp = spans.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val m = sp.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var si = 0
    var i = 0
    while (i < n) {
      while (si < m && sp.getStruct(si, 2).getInt(1) < i) si += 1
      val covered = si < m && {
        val s = sp.getStruct(si, 2)
        s.getInt(0) <= i && i <= s.getInt(1)
      }
      if (!covered) kept.add(ts.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
