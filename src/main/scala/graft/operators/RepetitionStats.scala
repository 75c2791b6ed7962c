package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition signals in ONE walk over the text (same
  * kernel rationale as [[TextStats]]: the composed
  * split + array_distinct + nested-HOF form runs interpreted and
  * re-walks the lines quadratically for the most-repeated-line share).
  *
  * Semantics:
  *  - a LINE is a `\n`-separated segment, trimmed; empty after trim →
  *    ignored (separators, not content);
  *  - a PARAGRAPH is a maximal run of non-blank lines (i.e. blank-line
  *    separated), its content the trimmed lines joined by a single
  *    `\n` — so trailing spaces inside lines don't defeat paragraph
  *    equality;
  *  - `dup_line_frac`  = 1 − distinct/total over non-blank lines;
  *  - `dup_para_frac`  = 1 − distinct/total over paragraphs;
  *  - `dup_line_char_frac` = chars in lines occurring ≥ 2 times ÷ total
  *    non-blank line chars (Gopher's duplicate-line character fraction);
  *  - empty/null text → all zeros.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = RepetitionStats.Schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return RepetitionStats.row(0.0, 0.0, 0.0)
    val s = v.asInstanceOf[UTF8String].toString

    val lineCounts = new java.util.HashMap[String, Long]()
    val paraCounts = new java.util.HashMap[String, Long]()
    var nLines = 0L
    var nParas = 0L
    var totalLineChars = 0L
    val para = new java.lang.StringBuilder

    def endPara(): Unit = {
      if (para.length > 0) {
        paraCounts.merge(para.toString, 1L, _ + _)
        nParas += 1
        para.setLength(0)
      }
    }
    var from = 0
    while (from <= s.length) {
      val nl = s.indexOf('\n', from)
      val end = if (nl < 0) s.length else nl
      val line = s.substring(from, end).trim
      if (line.isEmpty) endPara()
      else {
        lineCounts.merge(line, 1L, _ + _)
        nLines += 1
        totalLineChars += line.length
        if (para.length > 0) para.append('\n')
        para.append(line)
      }
      from = end + 1
      if (nl < 0) from = s.length + 1
    }
    endPara()

    if (nLines == 0) return RepetitionStats.row(0.0, 0.0, 0.0)
    var dupChars = 0L
    val it = lineCounts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2L) dupChars += e.getValue * e.getKey.length
    }
    RepetitionStats.row(
      1.0 - lineCounts.size.toDouble / nLines,
      if (nParas == 0) 0.0 else 1.0 - paraCounts.size.toDouble / nParas,
      if (totalLineChars == 0) 0.0
      else dupChars.toDouble / totalLineChars)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  val Schema: StructType = StructType(Seq(
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_para_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false)))

  private[operators] def row(a: Double, b: Double, c: Double)
      : GenericInternalRow = new GenericInternalRow(Array[Any](a, b, c))
}
