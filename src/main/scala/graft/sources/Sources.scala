package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, Nondeterministic, UnaryExpression}
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
    with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val parts = CsvLine.split(v.toString)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CsvLine =
    copy(child = newChild)

  override def prettyName: String = "csv_line"
}

/** Per-file line index computed during the scan itself — ONE pass, zero
  * shuffle, no RDD round-trip.
  *
  * Spark reads each file block (PartitionedFile) contiguously inside a
  * single task, so a stateful counter that resets at block boundaries
  * yields the exact row ordinal within the block. Emitting
  * `file_block_start + ordinal` then gives a value that is:
  *  - the EXACT line number for rows in a file's first block (block
  *    start 0) — where header lines live, and the whole file for anything
  *    under one split (~128 MB);
  *  - strictly monotone in file order across blocks (each line is ≥ 1
  *    byte, so ordinal ≤ block byte length ≤ next block's start), which is
  *    all last-duplicate-wins ordering needs.
  *
  * This replaces an RDD `zipWithIndex` — which ran an extra counting job
  * (second scan of the text) and dropped the whole import out of
  * Tungsten through an untyped RDD[Row] boundary.
  *
  * Nondeterministic (stateful, partition-order dependent), like Spark's
  * own MonotonicallyIncreasingID — which also stops the optimizer from
  * reordering the header-skip filter below the index assignment.
  */
case class PerBlockLineIndex(blockStart: Expression, filePath: Expression)
    extends Expression with Nondeterministic with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)
  override def children: Seq[Expression] = Seq(blockStart, filePath)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  @transient private var count: Long = 0L
  @transient private var curBlock: Long = -1L
  @transient private var curFile: UTF8String = null

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    count = 0L
    curBlock = -1L
    curFile = null
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val bs = blockStart.eval(input).asInstanceOf[Long]
    val fp = filePath.eval(input).asInstanceOf[UTF8String]
    if (bs != curBlock || curFile == null || curFile != fp) {
      curBlock = bs
      curFile = fp.clone()
      count = 0L
    }
    val out = bs + count
    count += 1L
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PerBlockLineIndex =
    copy(blockStart = newChildren(0), filePath = newChildren(1))

  override def prettyName: String = "per_block_line_index"
}

object CsvLine {
  /** Throws on a record whose quoted field never closes. In line-split
    * mode that is the signature of an embedded-newline record the text
    * scan broke in two (reference `csv.reader` at importsource.py:168-171
    * would have spanned the lines) — failing LOUDLY beats silently
    * parsing two broken rows. Multiline-safe records (quotes balanced,
    * `\n` inside quotes) parse fine: the newline is just a character. */
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
    if (inQuote) throw new IllegalArgumentException(
      "CSV record ends inside a quoted field (embedded newline split by " +
      "the line scan, or unbalanced quote). Use Sources.csv(..., " +
      s"multiline = true) for records spanning lines. Record: " +
      s"${s.take(80)}")
    fields += cur.toString
    fields.toSeq
  }

  def apply(c: Column): Column = Bridge.column(CsvLine(Bridge.expression(c)))
}

/** Quote-aware RECORD split of a whole file's content — the multiline
  * analogue of line splitting: a `\n` inside a quoted field is data, a
  * `\n` outside ends the record (`\r\n` normalized). Tracks the same
  * field-start/quote state machine as [[CsvLine.split]] but copies
  * characters verbatim, so each returned record re-parses identically.
  * A trailing newline terminates the last record without starting a new
  * one; an interior blank line is an empty record (Python `csv.reader`
  * yields `[]` for it — kept as `""` → `[""]`, the same shape line mode
  * produces). Row-wise by nature, hence an eval expression.
  */
case class CsvRecords(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val recs = CsvRecords.records(v.toString)
    new GenericArrayData(recs.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CsvRecords =
    copy(child = newChild)

  override def prettyName: String = "csv_records"
}

object CsvRecords {
  def records(s: String): Seq[String] = {
    val recs = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var fieldStart = true
    var i = 0
    def emit(): Unit = {
      if (cur.nonEmpty && cur.last == '\r') cur.setLength(cur.length - 1)
      recs += cur.toString
      cur.clear()
      fieldStart = true
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') {
            cur += c; cur += c; i += 1
          } else { inQuote = false; cur += c; fieldStart = false }
        } else cur += c
      } else c match {
        case '"' if fieldStart => inQuote = true; cur += c
        case ',' => cur += c; fieldStart = true
        case '\n' => emit()
        case other => cur += other; fieldStart = false
      }
      i += 1
    }
    if (cur.nonEmpty) emit() // no trailing empty record after a final \n
    recs.toSeq
  }

  def apply(c: Column): Column = Bridge.column(CsvRecords(Bridge.expression(c)))
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
    * Scale shape, default mode: ONE narrow text scan, zero shuffle — the
    * per-file line index is a stateful scan-time counter over `_metadata`
    * block offsets (see [[PerBlockLineIndex]]): exact line numbers in each
    * file's first block (where headers live), strictly file-order monotone
    * afterwards. A record whose quoted field embeds a newline CANNOT be
    * line-split; [[CsvLine]] rejects it loudly (the reference's
    * `csv.reader`, importsource.py:168-171, spans lines instead —
    * silently producing two broken rows here would corrupt the import).
    *
    * `multiline = true` handles such records exactly: each file is read
    * WHOLE and split into records by the quote-aware [[CsvRecords]], so
    * `_line` enumerates RECORDS — which is what the reference's header
    * skip actually indexes (it enumerates `csv.reader` output). The
    * trade-off is per-file (not per-block) parallelism, the same one
    * Spark's own `multiLine` CSV option makes: keep files ≲ a few hundred
    * MB in this mode, or split upstream.
    */
  def csv(spark: SparkSession, path: String, headerLines: Int = 0,
      multiline: Boolean = false): DataFrame = {
    if (multiline) {
      spark.read.option("wholetext", "true").text(path)
        .select(posexplode(CsvRecords(col("value"))).as(Seq("_pos", "_rec")))
        .select(
          CsvLine(col("_rec")).as(Mapping.RawCol),
          col("_pos").cast(LongType).as(Mapping.LineCol))
        .filter(col(Mapping.LineCol) > headerLines)
    } else {
      val idx = Bridge.column(PerBlockLineIndex(
        Bridge.expression(col("_metadata.file_block_start")),
        Bridge.expression(col("_metadata.file_path"))))
      spark.read.text(path)
        .select(
          CsvLine(col("value")).as(Mapping.RawCol),
          idx.as(Mapping.LineCol))
        .filter(col(Mapping.LineCol) > headerLines)
    }
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

  /** Inverse of [[CsvLine]] — the CSV EXPORT direction: renders string
    * columns as one RFC-4180 record, quoting any field containing the
    * delimiter, a quote, or a line break (embedded quotes doubled);
    * null renders as the empty field. Pure built-in expressions
    * (codegen'd, zero shuffle). Round-trip law `CsvLine ∘ toCsvLine =
    * identity` (and `CsvRecords` for multiline fields) is
    * property-tested in SourcesSpec. */
  def toCsvLine(cols: Seq[Column]): Column = {
    val fields = cols.map { c =>
      val f = coalesce(c.cast("string"), lit(""))
      when(f.rlike("[,\"\n\r]"),
        concat(lit("\""), regexp_replace(f, "\"", "\"\""), lit("\"")))
        .otherwise(f)
    }
    concat_ws(",", fields: _*)
  }

  /** JSON-Lines source: one JSON object per line — the standard
    * interchange format for document corpora. Read with an EXPLICIT
    * schema (inference would scan the data twice and drifts as records
    * evolve) into the table-shaped mapping route, so nested attributes
    * address via `Field` dotted paths and per-type parsers apply as
    * usual. `_line` is the same single-scan per-block index the CSV
    * source uses — file order, which is all the last-duplicate-wins
    * policies need. */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val idx = Bridge.column(PerBlockLineIndex(
      Bridge.expression(col("_metadata.file_block_start")),
      Bridge.expression(col("_metadata.file_path"))))
    spark.read.schema(schema).json(path)
      .withColumn(Mapping.LineCol, idx)
  }

  /** ORC source: the other columnar lake format (Spark ships the
    * reader natively — the orc-core jars, zero extra deps). Reads with
    * the SAME scan-side economics as parquet: column pruning and
    * predicate pushdown reach the stripe reader (SourcesSpec asserts
    * PushedFilters / ReadSchema on the scan), so an ORC-resident
    * corpus never reads dropped columns or filtered-out stripes.
    * `_line` is best-effort iteration order (the [[table]] face): ORC
    * carries no stable physical line identity the way the CSV
    * byte-offset index does. */
  def orc(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    table(spark.read.schema(schema).orc(path))

  /** Avro source: the row-major lake format ([[Avro.read]] — sync-split
    * container reads with the pinned schema as the Avro READER schema,
    * so decode skips non-requested fields; predicate pushdown does not
    * exist for Avro anywhere — filters apply post-decode). `_line` is
    * best-effort iteration order, the [[table]] face, same documented
    * boundary as ORC. */
  def avro(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    table(Avro.read(spark, path, schema))

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
