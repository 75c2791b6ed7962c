package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Null-safe parser / formatter library, re-expressing the reference's
  * `simpletasks_data/formatting.py:96-440` as Catalyst expression trees.
  *
  * Every function here is a `Column => Column` composition of built-in
  * (codegen'd) expressions — no per-row Scala UDFs — so plans stay inside
  * whole-stage codegen and vectorize at 100 TB. The only eval-based custom
  * expression is [[FormatList]] (quote-aware list split), which has no
  * built-in equivalent.
  *
  * All functions are ANSI-mode safe: casts are regex-guarded or use
  * `try_to_timestamp`, so malformed input yields NULL (the Spark analogue of
  * the reference's warn-and-skip on ValueError) instead of failing the job.
  */
object Parsers {

  /** The characters Python `str.strip()` removes (the `str.isspace()`
    * set): ASCII whitespace, the C1 separators FS-US + NEL, and the
    * Unicode spaces — notably U+00A0 NBSP, the standard French padding
    * character the fr_FR parsers exist for. Shared with the
    * differential-test model. */
  val PyWhitespace: String =
    " \t\n\u000B\f\r" +
      "\u001C\u001D\u001E\u001F\u0085\u00A0\u1680" +
      "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007" +
      "\u2008\u2009\u200A\u2028\u2029\u202F\u205F\u3000"

  /** Python `str.strip()` analogue (Spark's bare `trim` strips SPACES
    * only — a tab- or NBSP-padded value must still parse like the
    * reference). */
  private def pyStrip(c: Column): Column = trim(c, PyWhitespace)

  // ---------------------------------------------------------------- booleans

  /** Truthy tokens per formatting.py:178 (case-insensitive, incl. fr). */
  private val TrueTokens = Seq("yes", "true", "t", "1", "oui", "vrai")

  /** formatting.py:167 `str2bool` — any other value (incl. blank) is false. */
  def str2bool(c: Column): Column =
    coalesce(lower(c).isin(TrueTokens: _*), lit(false))

  /** formatting.py:181 `str2boolnullable` — empty/null → NULL; note `" "`
    * (non-empty whitespace) is *false*, not null, matching the reference. */
  def str2boolnullable(c: Column): Column =
    when(c.isNull || c === "", lit(null).cast(BooleanType))
      .otherwise(lower(c).isin(TrueTokens: _*))

  // ----------------------------------------------------------------- strings

  /** formatting.py:195 `str2strnullable` — trim; empty → NULL; optional
    * max-length truncation (applied after trim). */
  def str2strnullable(c: Column, maxlength: Option[Int] = None): Column = {
    val t = pyStrip(c)
    val v = maxlength.map(n => substring(t, 1, n)).getOrElse(t)
    when(c.isNull || t === "", lit(null).cast(StringType)).otherwise(v)
  }

  // ---------------------------------------------------------------- numerics

  private val IntRe = "^[+-]?\\d+$"
  private val FloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"

  /** formatting.py:231 `str2intnullable` — strict integer syntax only.
    * ANSI `try_cast` string→bigint has exactly Python `int()`'s accept set
    * on the reference's vectors ("42.56"/""/"foobar"/"4e2"/"0x1A" → NULL,
    * " 42 "/"+7" → value) and generates a plain null-producing cast
    * instead of a CASE WHEN + RLIKE pair — cheaper, and it keeps the
    * upsert merge filter codegen-friendly. Documented divergence:
    * Python's underscored literals ("1_0") parse to NULL here. */
  def str2intnullable(c: Column): Column =
    pyStrip(c).try_cast(LongType)

  /** formatting.py:265 `str2floatnullable` — `float(v.strip())` or NULL.
    * Python's special spellings (inf/infinity/nan, any case, signed) are
    * honored explicitly; Java-only literal forms that `float()` rejects —
    * type suffixes ("1.0f", "2d") and hex floats ("0x1p3") — are guarded
    * to NULL before the cast. Remaining documented divergence: Python's
    * underscored literals ("1_0.5") parse to NULL here. */
  def str2floatnullable(c: Column): Column = {
    val t = pyStrip(c)
    val lt = lower(t)
    when(lt.isin("inf", "infinity", "+inf", "+infinity"),
      lit(Double.PositiveInfinity))
      .when(lt.isin("-inf", "-infinity"), lit(Double.NegativeInfinity))
      .when(lt.isin("nan", "+nan", "-nan"), lit(Double.NaN))
      .when(t.rlike("(?i)[fd]$") || t.rlike("(?i)^[+-]?0x"),
        lit(null).cast(DoubleType))
      .otherwise(t.try_cast(DoubleType))
  }

  // ----------------------------------------------------------------- amounts

  /** formatting.py:134 `formatMontant` — normalizes a messy amount string:
    * `(x)` → `-x`; en_US drops thousands `,`, fr_FR maps decimal `,` → `.`;
    * strips regular, no-break and narrow-no-break spaces; empty/`-` → "0".
    * Returns a STRING (like the reference); see str2int/floatamount. */
  def formatMontant(c: Column, shittyFormat: String = "en_US"): Column = {
    val stripped = pyStrip(c)
    val neg = when(
      stripped.contains("("),
      concat(lit("-"), regexp_replace(stripped, "[()]", ""))
    ).otherwise(stripped)
    val dec =
      if (shittyFormat == "en_US") regexp_replace(neg, ",", "")
      else regexp_replace(neg, ",", ".")
    val cleaned = regexp_replace(dec, "[   ]", "")
    when(c.isNull || stripped === "" || cleaned === "" || cleaned === "-",
      lit("0")).otherwise(cleaned)
  }

  /** formatting.py:247 `str2intamount` — unparseable → 0 (not NULL). */
  def str2intamount(c: Column, shittyFormat: String = "en_US"): Column = {
    val m = formatMontant(c, shittyFormat)
    when(m.rlike(IntRe), m.cast(LongType)).otherwise(lit(0L))
  }

  /** formatting.py:282 `str2floatamount` — unparseable → 0.0 (not NULL). */
  def str2floatamount(c: Column, shittyFormat: String = "en_US"): Column = {
    val m = formatMontant(c, shittyFormat)
    when(m.rlike(FloatRe), m.cast(DoubleType)).otherwise(lit(0.0))
  }

  // ------------------------------------------------------------------- dates

  /** Max datetime sentinel: the reference maps "10000-01-01[ 0:00:00]" to
    * `datetime.max` (9999-12-31 23:59:59.999999). */
  private def maxTimestamp: Column =
    to_timestamp(lit("9999-12-31 23:59:59.999999"))

  private def tryFormats(s: Column, fmts: Seq[String]): Column =
    coalesce(fmts.map(f => try_to_timestamp(s, lit(f))): _*)

  /** formatting.py:300 `parseShittyDate` — branch on `/` vs `.` vs ISO, each
    * with a locale-primary format and a swapped fallback. Single-digit day /
    * month accepted (Python's strptime is lenient there too). */
  def parseShittyDate(c: Column, shittyFormat: String = "fr_FR"): Column = {
    val s = pyStrip(c)
    val fr = shittyFormat == "fr_FR"
    val slash =
      if (fr) Seq("d/M/yyyy", "M/d/yyyy") else Seq("M/d/yyyy", "d/M/yyyy")
    val dot =
      if (fr) Seq("d.M.yyyy", "M.d.yyyy") else Seq("M.d.yyyy", "d.M.yyyy")
    when(c.isNull || s === "", lit(null).cast(TimestampType))
      .when(s.isin("10000-01-01", "10000-01-01 0:00:00"), maxTimestamp)
      .when(s.contains("/"), tryFormats(s, slash))
      .when(s.contains("."), tryFormats(s, dot))
      .otherwise(try_to_timestamp(s, lit("yyyy-M-d")))
  }

  /** formatting.py:341 `parseShittyDateAsDate` — date-typed variant. */
  def parseShittyDateAsDate(c: Column, shittyFormat: String = "fr_FR"): Column =
    parseShittyDate(c, shittyFormat).cast(DateType)

  /** formatting.py:360 `parseShittyDateTime` — note the reference's default
    * locale here is en_US (the reverse of parseShittyDate). */
  def parseShittyDateTime(c: Column, shittyFormat: String = "en_US"): Column = {
    val s = pyStrip(c)
    val us = shittyFormat == "en_US"
    val slash =
      if (us) Seq("M/d/yyyy H:m:s", "d/M/yyyy H:m:s")
      else Seq("d/M/yyyy H:m:s", "M/d/yyyy H:m:s")
    val dot =
      if (us) Seq("M.d.yyyy H:m:s", "d.M.yyyy H:m:s")
      else Seq("d.M.yyyy H:m:s", "M.d.yyyy H:m:s")
    when(c.isNull || s === "", lit(null).cast(TimestampType))
      .when(s === "10000-01-01 0:00:00", maxTimestamp)
      .when(s.contains("/"), tryFormats(s, slash))
      .when(s.contains("."), tryFormats(s, dot))
      .otherwise(try_to_timestamp(s, lit("yyyy-M-d H:m:s")))
  }

  /** formatting.py:409 `parseShittyTime` — "%H:%M:%S" → duration. Returned
    * as whole seconds (LongType): parquet/oracle-friendly, unlike interval
    * types, and losslessly equal to the reference's timedelta. */
  def parseShittyTime(c: Column): Column = {
    val s = pyStrip(c)
    val t = try_to_timestamp(s, lit("H:m:s"))
    when(c.isNull || s === "", lit(null).cast(LongType))
      .otherwise(hour(t) * 3600L + minute(t) * 60L + second(t))
  }

  // -------------------------------------------------------------- formatters

  /** strftime → Spark/JavaTime datetime pattern translation, for
    * `dump_datetime`'s passthrough branch (formatting.py:36:
    * `value.strftime(fmt)`). Literal runs that contain pattern letters are
    * single-quoted; `%%` is a literal percent; `%z` renders empty (the
    * reference's datetimes are naive, so strftime gives '' for %z);
    * unrecognized directives stay as literal text, like C strftime. */
  private[graft] def strftimeToJava(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(ch => Character.isLetter(ch) || ch == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '%' && i + 1 < fmt.length) {
        val mapped: Option[String] = fmt.charAt(i + 1) match {
          case 'Y' => Some("yyyy")
          case 'y' => Some("yy")
          case 'm' => Some("MM")
          case 'd' => Some("dd")
          case 'H' => Some("HH")
          case 'I' => Some("hh")
          case 'M' => Some("mm")
          case 'S' => Some("ss")
          case 'f' => Some("SSSSSS")
          case 'p' => Some("a")
          case 'a' => Some("EEE")
          case 'A' => Some("EEEE")
          case 'b' => Some("MMM")
          case 'B' => Some("MMMM")
          case 'j' => Some("DDD")
          case 'z' => Some("")
          case '%' => None // literal percent
          case _   => None // unknown directive: keep as literal text
        }
        mapped match {
          case Some(p) => flushLit(); out.append(p); i += 2
          case None =>
            if (fmt.charAt(i + 1) == '%') { lit.append('%'); i += 2 }
            else { lit.append('%').append(fmt.charAt(i + 1)); i += 2 }
        }
      } else { lit.append(ch); i += 1 }
    }
    flushLit()
    out.toString
  }

  /** formatting.py:14 `dump_datetime` — shorthand "json" / "gs" formats;
    * any other fmt CONTAINING `%` is treated as strftime (the reference
    * passes it to `value.strftime`, formatting.py:36) and translated;
    * a %-free fmt is taken as an already-Spark pattern. */
  def dumpDatetime(c: Column, fmt: String = "json"): Column = {
    val pattern = fmt match {
      case "json"                       => "yyyy-MM-dd'T'HH:mm:ss"
      case "gs"                         => "yyyy-MM-dd HH:mm:ss"
      case other if other.contains('%') => strftimeToJava(other)
      case other                        => other
    }
    date_format(c, pattern)
  }

  /** formatting.py:54 `dump_int` — "{:.0f}"; NULL → "0". Python's format
    * rounds half-even, java.util.Formatter rounds half-up, so we bround
    * first to keep the two (and the DuckDB oracle's C printf) in agreement. */
  def dumpInt(c: Column): Column =
    format_string("%.0f", bround(coalesce(c.cast(DoubleType), lit(0.0)), 0))

  /** formatting.py:68 `dump_percentage` — value in [0,1] → "45.6" style,
    * 1 decimal, half-even like Python. NULL → "0.0". */
  def dumpPercentage(c: Column): Column =
    format_string(
      "%.1f",
      bround(coalesce(c.cast(DoubleType), lit(0.0)) * 100, 1))

  /** formatting.py:82 `dump_str` — NULL/blank → "-". */
  def dumpStr(c: Column): Column =
    when(c.isNull || pyStrip(c) === "", lit("-")).otherwise(c)

  /** formatting.py:39 `dump_gps` — POINT → "lat, lng" with 6 decimals; here
    * the geography is a struct<lat:double,lng:double> column. */
  def dumpGps(c: Column): Column =
    when(c.isNull, lit(null).cast(StringType))
      .otherwise(format_string("%f, %f", c.getField("lat"), c.getField("lng")))

  // ------------------------------------------------------------------- lists

  /** formatting.py:431 `to_list` — drop falsy elements from an array of
    * strings (NULL and ""). */
  def toList(c: Column): Column =
    filter(coalesce(c, array()), x => x.isNotNull && x =!= "")

  /** formatting.py:96 `formatList` — quote- and paren-aware list split; see
    * [[FormatList]] for the expression. NULL → empty array. */
  def formatList(
      c: Column,
      replaceSemicolons: Boolean = true,
      replaceAnds: Boolean = true): Column =
    org.apache.spark.sql.graft.Bridge.column(
      FormatList(
        org.apache.spark.sql.graft.Bridge.expression(c),
        replaceSemicolons,
        replaceAnds))
}
