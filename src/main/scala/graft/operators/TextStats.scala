package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE walk over the string:
  * char / token / punctuation / digit counts and the four stopword-hit
  * tallies behind [[TextAnalysis.langId]] and the quality score.
  *
  * The composed form (`transform(tokens(text), lower)` + four
  * `filter(...isInCollection...)` + three `regexp_count`) re-walks the text
  * eight-plus times per row and runs interpreted (HigherOrderFunction has
  * no codegen) — the exact pattern the SURVEY §2 round-2 lesson flags.
  * One eval-based expression replaces the whole family.
  *
  * Semantics replicate the composed built-ins bit-for-bit (the DuckDB
  * oracles recompute them in SQL):
  *  - tokens: ASCII-space trim, then Spark `split("\\s+")` (limit −1) —
  *    leading or trailing non-space whitespace each contribute one empty
  *    token; empty/null text → 0 tokens;
  *  - punct: Java `\p{Punct}` = ASCII 33-47, 58-64, 91-96, 123-126;
  *  - chars: code points, like Spark's `length`;
  *  - stopword hits: case-insensitive token membership, counted per
  *    occurrence.
  */
case class TextStats(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = TextStats.Schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return TextStats.zeroRow()
    val s = v.asInstanceOf[UTF8String].toString

    var nChars = 0L
    var nPunct = 0L
    var nDigits = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp >= '0' && cp <= '9') nDigits += 1
      if ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
          (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) nPunct += 1
      i += Character.charCount(cp)
    }

    // Token walk over the ASCII-space-trimmed view, replicating
    // split("\\s+"): Java \s = [ \t\n\f\r].
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1

    var nToks = 0L
    var en = 0L
    var fr = 0L
    var de = 0L
    var es = 0L
    if (to > from) {
      if (isWs(s.charAt(from))) nToks += 1 // split's leading empty token
      if (isWs(s.charAt(to - 1))) nToks += 1 // split(limit=-1) KEEPS one
      // trailing empty token when the trimmed text ends in whitespace
      var p = from
      while (p < to) {
        if (isWs(s.charAt(p))) { p += 1 }
        else {
          val start = p
          while (p < to && !isWs(s.charAt(p))) p += 1
          nToks += 1
          val tok = s.substring(start, p).toLowerCase(java.util.Locale.ROOT)
          if (TextStats.En.contains(tok)) en += 1
          if (TextStats.Fr.contains(tok)) fr += 1
          if (TextStats.De.contains(tok)) de += 1
          if (TextStats.Es.contains(tok)) es += 1
        }
      }
    }

    new GenericInternalRow(
      Array[Any](nChars, nToks, nPunct, nDigits, en, fr, de, es))
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextStats = copy(child = newChild)

  override def prettyName: String = "text_stats"
}

object TextStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("stop_en", LongType, nullable = false),
    StructField("stop_fr", LongType, nullable = false),
    StructField("stop_de", LongType, nullable = false),
    StructField("stop_es", LongType, nullable = false)))

  private[operators] def zeroRow(): GenericInternalRow =
    new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))

  private val En = TextAnalysis.StopwordsEn.toSet
  private val Fr = TextAnalysis.StopwordsFr.toSet
  private val De = TextAnalysis.StopwordsDe.toSet
  private val Es = TextAnalysis.StopwordsEs.toSet
}
