package graft.mapping

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Parsers
import graft.helpers.A1N1

/** Per-column import policies (reference: mapping.py:34-70 `_Column` ctor).
  *
  * `comparator` returns a BOOLEAN Column that is true when the two values
  * are EQUAL (used for change detection; default is null-safe `<=>`).
  */
final case class ColOpts(
    shouldUpdate: Boolean = true,
    shouldUpdateOnlyIfNull: Boolean = false,
    keepHistory: Boolean = false,
    comparator: Option[(Column, Column) => Column] = None,
    formatter: Option[Column => Column] = None,
    header: Option[String] = None,
    warnOnError: Boolean = true,
    warnIfEmpty: Boolean = false,
    failOnOutOfRange: Boolean = true) {

  /** Equality test for change detection (comparator or null-safe equals). */
  def equalTo(a: Column, b: Column): Column =
    comparator.map(f => f(a, b)).getOrElse(a <=> b)
}

/** A declarative column spec that compiles to a Catalyst [[Column]] over the
  * raw source DataFrame. Spark re-expression of mapping.py:100-471: instead
  * of per-row `get()` calls with a value cache, each spec contributes one
  * expression to a single projection (Catalyst CSE subsumes the reference's
  * `_Caching`).
  */
sealed trait ColSpec {
  def opts: ColOpts
  def parser: Option[Column => Column]

  /** Raw (pre-parser) expression — mirror of `get_raw_values`. */
  def raw: Column

  /** Parsed expression — mirror of `get`. */
  def expr: Column
}

/** CSV column by 0-based index over the `_raw array<string>` column
  * (reference: mapping.py:100 `Column`). `failOnOutOfRange` mirrors
  * mapping.py:157-162: strict (default) raises on a too-short row — here
  * the ANSI `element_at` error fails the job, the distributed analogue of
  * the reference's uncaught IndexError; lenient yields `""` (which the
  * parsers turn into NULL), exactly the reference's fallback value. */
final case class IndexedCol(
    index: Int,
    parser: Option[Column => Column] = None,
    opts: ColOpts = ColOpts()) extends ColSpec {
  // Strict path uses 0-based getItem (GetArrayItem) rather than
  // element_at: same ANSI out-of-range error, but Catalyst's
  // SimplifyExtractValueOps collapses `array(...)[i]` from
  // column-derived sources straight to the source column — no array
  // construction in the plan (ElementAt has no such rule, and its
  // codegen also trips a Janino error when constraint propagation marks
  // the selected element non-nullable).
  def raw: Column =
    if (opts.failOnOutOfRange) col(Mapping.RawCol).getItem(index)
    else coalesce(
      try_element_at(col(Mapping.RawCol), lit(index + 1)), lit(""))
  def expr: Column = parser.getOrElse(identity[Column] _)(raw)
}

/** N input columns → computed value (reference: mapping.py:182). */
final case class ComputedCol(
    inputs: Seq[ColSpec],
    computer: Seq[Column] => Column,
    opts: ColOpts = ColOpts()) extends ColSpec {
  def parser: Option[Column => Column] = None
  def raw: Column = array(inputs.map(_.raw.cast(StringType)): _*)
  def expr: Column = computer(inputs.map(_.expr))
}

/** Constant-valued column (reference: mapping.py:258). */
final case class StaticCol(value: Any, opts: ColOpts = ColOpts())
    extends ColSpec {
  def parser: Option[Column => Column] = None
  def raw: Column = lit(value).cast(StringType)
  def expr: Column = lit(value)
}

/** Model field with dotted-path traversal over struct columns
  * (reference: mapping.py:316, path walk :359). */
final case class FieldCol(
    path: Option[String] = None,
    parser: Option[Column => Column] = None,
    opts: ColOpts = ColOpts()) extends ColSpec {
  private[mapping] var resolvedPath: Option[String] = path
  private def target: String = resolvedPath.getOrElse(
    throw new IllegalStateException("FieldCol path unresolved — call complete()"))
  def raw: Column = col(target).cast(StringType)
  def expr: Column = parser.getOrElse(identity[Column] _)(col(target))
}

/** N fields → computed value (reference: mapping.py:397). */
final case class ComputedFieldCol(
    inputs: Seq[FieldCol],
    computer: Seq[Column] => Column,
    opts: ColOpts = ColOpts()) extends ColSpec {
  def parser: Option[Column => Column] = None
  def raw: Column = array(inputs.map(_.raw): _*)
  def expr: Column = computer(inputs.map(_.expr))
}

/** Declarative source→model mapping (reference: mapping.py:473 `Mapping`).
  *
  * Columns are registered in order with `auto()` / `col()` (A1N1 or index
  * addressing, reference mapping.py:480-508) or as fields. `complete()`
  * performs the reference's `_complete_from_model` (mapping.py:556-633):
  * parser inference from the target schema, field-name defaulting, key
  * lookup. `project(raw)` compiles the whole mapping to one projection.
  */
class Mapping(val keyColumnName: String = "id") {

  private var autoCounter = 0
  private val registry = mutable.LinkedHashMap.empty[String, ColSpec]
  private var completed = false

  /** Key normalizer (reference: get_key_column_comparator, mapping.py:522). */
  def keyComparator: Column => Column = identity

  /** Lines to skip in the source; 0 = one header line, -1 = none
    * (reference: get_header_line_number, mapping.py:533). */
  def headerLineNumber: Int = 0

  /** Register a column at the next index (reference: mapping.py:480). */
  def auto(
      name: String,
      parser: Column => Column = null,
      opts: ColOpts = ColOpts()): IndexedCol = {
    val c = IndexedCol(autoCounter, Option(parser), opts)
    autoCounter += 1
    register(name, c)
  }

  /** Register a column at an A1N1 name or 0-based index; resets the auto
    * counter (reference: mapping.py:494). */
  def col(
      name: String,
      column: Any,
      parser: Column => Column = null,
      opts: ColOpts = ColOpts()): IndexedCol = {
    val idx = column match {
      case s: String => A1N1.col2num(s)
      case i: Int    => i
      case other => throw new IllegalArgumentException(s"bad column: $other")
    }
    autoCounter = idx + 1
    register(name, IndexedCol(idx, Option(parser), opts))
  }

  def computed(
      name: String,
      inputs: Seq[ColSpec],
      computer: Seq[Column] => Column,
      opts: ColOpts = ColOpts()): ComputedCol =
    register(name, ComputedCol(inputs, computer, opts))

  def static(name: String, value: Any, opts: ColOpts = ColOpts()): StaticCol =
    register(name, StaticCol(value, opts))

  def field(
      name: String,
      path: String = null,
      parser: Column => Column = null,
      opts: ColOpts = ColOpts()): FieldCol =
    register(name, FieldCol(Option(path), Option(parser), opts))

  def computedField(
      name: String,
      inputs: Seq[FieldCol],
      computer: Seq[Column] => Column,
      opts: ColOpts = ColOpts()): ComputedFieldCol =
    register(name, ComputedFieldCol(inputs, computer, opts))

  private def register[T <: ColSpec](name: String, spec: T): T = {
    registry.put(name, spec)
    spec
  }

  def columns: Seq[(String, ColSpec)] = registry.toSeq

  def keySpec: ColSpec = registry.getOrElse(
    keyColumnName,
    throw new IllegalArgumentException(
      s"Could not find key column $keyColumnName in mapping"))

  /** Parser inference from the target schema — the Spark analogue of the
    * SQLAlchemy-type dispatch at mapping.py:583-598. String fields honor a
    * "maxlength" metadata key (SQLAlchemy String(length) equivalent). */
  private def inferParser(f: StructField): Column => Column = f.dataType match {
    case BooleanType => Parsers.str2boolnullable
    case ByteType | ShortType | IntegerType | LongType =>
      c => Parsers.str2intnullable(c).cast(f.dataType)
    case FloatType | DoubleType | _: DecimalType =>
      c => Parsers.str2floatnullable(c).cast(f.dataType)
    case StringType =>
      val max =
        if (f.metadata.contains("maxlength"))
          Some(f.metadata.getLong("maxlength").toInt)
        else None
      c => Parsers.str2strnullable(c, max)
    case DateType => c => Parsers.parseShittyDateAsDate(c)
    case TimestampType => c => Parsers.parseShittyDateTime(c)
    case other => throw new NotImplementedError(
      s"Could not find parser for type $other; provide one for ${f.name}")
  }

  /** `_complete_from_model` (mapping.py:556-633): fill parsers from the
    * target schema, default Field paths to their registered name, and check
    * the key column exists. Idempotent. */
  def complete(targetSchema: StructType): this.type = {
    if (completed) return this
    val byName = targetSchema.fields.map(f => f.name -> f).toMap
    registry.foreach { case (name, spec) =>
      spec match {
        case c: IndexedCol if c.parser.isEmpty =>
          val f = byName.getOrElse(name, throw new IllegalArgumentException(
            s"Column $name not in target schema and has no parser"))
          registry.put(name, c.copy(parser = Some(inferParser(f))))
        case fc: FieldCol =>
          if (fc.resolvedPath.isEmpty) fc.resolvedPath = Some(name)
        case _ => ()
      }
    }
    keySpec // validates key presence (mapping.py:631)
    completed = true
    this
  }

  /** Warning surface — the distributed analogue of the reference's
    * `warn_on_error` / `warn_if_empty` logging (mapping.py:48-49,
    * importtask.py:262-284). Instead of driver-side log lines, returns a
    * DataFrame of (line, column, raw_value, warning) rows:
    *  - `parse_error`: raw value non-empty but parser yielded NULL
    *    (the reference's ValueError path), for columns with warnOnError;
    *  - `empty`: parsed value NULL/empty-string for columns with
    *    warnIfEmpty (the reference's Python-falsy check also fires on 0 and
    *    False — deliberately not mirrored, as numeric zeros are legitimate
    *    values at scale).
    */
  def diagnostics(raw: DataFrame): DataFrame = {
    val entries = registry.toSeq.flatMap { case (name, spec) =>
      spec match {
        case c: IndexedCol if c.opts.warnOnError || c.opts.warnIfEmpty =>
          val rawV = c.raw
          val parsed = c.expr
          val parsedEmpty = parsed.isNull || parsed.cast(StringType) === ""
          val parseError = lit(c.opts.warnOnError) &&
            rawV.isNotNull && trim(rawV) =!= "" && parsed.isNull
          val emptyWarn = lit(c.opts.warnIfEmpty) && parsedEmpty
          Some(struct(
            lit(name).as("column"),
            rawV.cast(StringType).as("raw_value"),
            when(parseError, "parse_error")
              .when(emptyWarn, "empty")
              .otherwise(lit(null).cast(StringType)).as("warning")))
        case _ => None
      }
    }
    if (entries.isEmpty)
      return raw.sparkSession.emptyDataFrame
    val fcol = org.apache.spark.sql.functions.col _
    raw
      .select(fcol(Mapping.LineCol), explode(array(entries: _*)).as("w"))
      .filter(fcol("w.warning").isNotNull)
      .select(
        fcol(Mapping.LineCol).as("line"),
        fcol("w.column").as("column"),
        fcol("w.raw_value").as("raw_value"),
        fcol("w.warning").as("warning"))
  }

  /** Export direction (reference: Mapping “between a model and a
    * destination (for exporting)”, mapping.py:474; per-column `formatter`
    * and `header`, mapping.py:54-70): formats each mapped model column as a
    * string — custom formatter, or the reference default
    * `str(x) if x is not None else ""` — named by its header. */
  def export(df: DataFrame): DataFrame = {
    val fcol = org.apache.spark.sql.functions.col _
    val cols = registry.toSeq.map { case (name, spec) =>
      val v = fcol(name)
      val formatted = spec.opts.formatter.map(f => f(v)).getOrElse(
        coalesce(v.cast(StringType), lit("")))
      formatted.as(spec.opts.header.getOrElse(name))
    }
    df.select(cols: _*)
  }

  /** Compiles the mapping to a single projection over the raw DataFrame.
    * Keeps [[Mapping.LineCol]] (needed for last-dup-wins) and
    * [[Mapping.IgnoreCol]] (should_import stats) when present. */
  def project(raw: DataFrame): DataFrame = {
    val cols = registry.toSeq.map { case (name, spec) => spec.expr.as(name) }
    val carry = Seq(Mapping.LineCol, Mapping.IgnoreCol)
      .filter(raw.columns.contains)
      .map(org.apache.spark.sql.functions.col)
    raw.select(cols ++ carry: _*)
  }
}

object Mapping {
  /** Column holding the raw row as array<string> in CSV-shaped sources. */
  val RawCol = "_raw"

  /** Per-file line index column attached by CsvSource (ordering for
    * last-duplicate-wins upsert semantics). */
  val LineCol = "_line"

  /** should_import flag column attached by ImportPipeline (rows to ignore,
    * counted in upsert stats — importtask.py:236-238,:303). */
  val IgnoreCol = "_ign"
}
