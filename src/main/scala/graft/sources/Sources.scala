package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.mapping.Mapping

/** RFC-4180-ish CSV line split (delimiter `,`, quotechar `"`, doubled-quote
  * escape) — the Spark-side analogue of the reference's
  * `csv.reader(csvfile, delimiter=",", quotechar='"')` at
  * importsource.py:170. Row-wise by nature, hence an eval expression.
  */
case class CsvLine(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val parts = CsvLine.split(v.toString)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CsvLine =
    copy(child = newChild)

  override def prettyName: String = "csv_line"
}

object CsvLine {
  def split(s: String): Seq[String] = {
    val fields = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') {
            cur += '"'; i += 1
          } else inQuote = false
        } else cur += c
      } else {
        if (c == '"' && cur.isEmpty) inQuote = true
        else if (c == ',') { fields += cur.toString; cur.clear() }
        else cur += c
      }
      i += 1
    }
    fields += cur.toString
    fields.toSeq
  }

  def apply(c: Column): Column = Bridge.column(CsvLine(Bridge.expression(c)))
}

/** Sources produce a raw DataFrame with:
  *  - `_raw`  array<string> — the positional row (CSV-shaped sources), and/or
  *    the model columns directly (table sources), plus
  *  - `_line` long — per-file source order, for last-duplicate-wins.
  */
object Sources {

  /** CSV source with N-line header skip (reference: ImportCsv at
    * importsource.py:154 + get_header_line_number at mapping.py:533 —
    * skip all lines with index <= headerLines; -1 skips nothing).
    *
    * Scale shape: a single narrow text scan; line indexes are derived from
    * `zipWithIndex` (partition-ordered = file+offset order) and made
    * PER-FILE by subtracting each file's minimum global index, joined back
    * via a broadcast of the tiny per-file offset table — the raw data is
    * never shuffled.
    */
  def csv(spark: SparkSession, path: String, headerLines: Int = 0): DataFrame = {
    val raw = spark.read.text(path)
      .select(input_file_name().as("_file"), col("value"))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_file", StringType),
      org.apache.spark.sql.types.StructField("value", StringType),
      org.apache.spark.sql.types.StructField("_gidx", LongType)))
    val withIdx = spark.createDataFrame(
      raw.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), r.getString(1), i)
      },
      schema)

    val offsets = withIdx.groupBy("_file")
      .agg(min("_gidx").as("_file_offset"))

    withIdx
      .join(broadcast(offsets), "_file")
      .select(
        CsvLine(col("value")).as(Mapping.RawCol),
        (col("_gidx") - col("_file_offset")).as(Mapping.LineCol))
      .filter(col(Mapping.LineCol) > headerLines)
  }

  /** CSV source whose header-skip comes from the mapping (reference flow:
    * ImportSource.get_header_line_number delegates to the Mapping,
    * importsource.py:88-96). */
  def csvFor(
      spark: SparkSession,
      path: String,
      mapping: graft.mapping.Mapping): DataFrame =
    csv(spark, path, mapping.headerLineNumber)

  /** In-memory rows as a CSV-shaped source (for specs / derived sources):
    * each row is a sequence of strings, `_line` is the sequence index. */
  def rows(spark: SparkSession, data: Seq[Seq[String]], headerLines: Int = 0)
      : DataFrame = {
    import spark.implicits._
    data.zipWithIndex
      .map { case (r, i) => (r, i.toLong) }
      .toDF(Mapping.RawCol, Mapping.LineCol)
      .filter(col(Mapping.LineCol) > headerLines)
  }

  /** Turns any DataFrame into a CSV-shaped raw source by casting the given
    * columns to string positionally (used to exercise the CSV mapping path
    * on parquet-born data without materializing files). */
  def fromColumns(df: DataFrame, cols: Seq[Column], order: Column): DataFrame =
    df.select(
      array(cols.map(_.cast(StringType)): _*).as(Mapping.RawCol),
      order.cast(LongType).as(Mapping.LineCol))

  /** Table source (reference: ImportTable at importsource.py:173): any
    * DataFrame; `_line` preserves iteration order best-effort. Field-based
    * mappings read model columns directly. */
  def table(df: DataFrame, order: Option[Column] = None): DataFrame =
    df.withColumn(
      Mapping.LineCol,
      order.getOrElse(monotonically_increasing_id()).cast(LongType))
}
