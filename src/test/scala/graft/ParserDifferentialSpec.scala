package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{Parsers => P}

/** Randomized DIFFERENTIAL testing of the parser family: a direct Scala
  * model of the reference's Python semantics (formatting.py — int(),
  * float(), formatMontant, str2bool), evaluated against the Spark
  * expressions over generated messy inputs. Inputs are drawn from the
  * ASCII domain the reference actually handles (no Python-only exotica
  * like underscored int literals), each property runs as ONE Spark action
  * over a generated column.
  */
class ParserDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 500): Seq[A] =
    Iterator.continually(gen.sample).flatten.take(n).toSeq

  // ---- reference models (from formatting.py, independent of the impl) ----

  private val IntRe = "^[+-]?\\d+$".r
  private val FloatRe = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

  /** Python str.strip(): same character set the implementation trims. */
  private def pyStrip(s: String): String = {
    val ws = P.PyWhitespace.toSet
    s.dropWhile(ws).reverse.dropWhile(ws).reverse
  }

  /** int(v.strip()) or None (formatting.py:231). */
  private def modelInt(s: String): Option[Long] = {
    val t = pyStrip(s)
    if (IntRe.findFirstIn(t).isDefined)
      try Some(java.lang.Long.parseLong(t)) catch { case _: Exception => None }
    else None
  }

  /** float(v.strip()) or None (formatting.py:265) — including Python's
    * case-insensitive inf/infinity/nan spellings, which Java's parser
    * does NOT share (and excluding Java-only suffix/hex forms). */
  private def modelFloat(s: String): Option[Double] = {
    val t = pyStrip(s)
    t.toLowerCase match {
      case "inf" | "infinity" | "+inf" | "+infinity" =>
        Some(Double.PositiveInfinity)
      case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
      case "nan" | "+nan" | "-nan" => Some(Double.NaN)
      case _ =>
        if (FloatRe.findFirstIn(t).isDefined) Some(t.toDouble) else None
    }
  }

  /** formatMontant (formatting.py:134): strip, (x) → -x, locale separator
    * normalization, drop spaces incl. U+00A0/U+202F, empty/"-" → "0". */
  private def modelMontant(s: String, fmt: String): String = {
    val stripped = pyStrip(s)
    val neg =
      if (stripped.contains("(")) "-" + stripped.replaceAll("[()]", "")
      else stripped
    val dec =
      if (fmt == "en_US") neg.replace(",", "")
      else neg.replace(',', '.')
    val cleaned = dec.replaceAll("[   ]", "")
    if (stripped.isEmpty || cleaned.isEmpty || cleaned == "-") "0" else cleaned
  }

  private def modelIntAmount(s: String, fmt: String): Long =
    modelInt(modelMontant(s, fmt)).getOrElse(0L)

  private def modelFloatAmount(s: String, fmt: String): Double =
    modelFloat(modelMontant(s, fmt)).getOrElse(0.0)

  /** str2bool (formatting.py:178): v.lower() in the truthy set. */
  private def modelBool(s: String): Boolean =
    Set("yes", "true", "t", "1", "oui", "vrai")(s.toLowerCase)

  // ------------------------------------------------------------ generators

  private val numericJunk: Gen[String] = {
    val core = Gen.oneOf(
      Gen.choose(-999999L, 999999L).map(_.toString),
      Gen.choose(-9999.0, 9999.0).map(d => f"$d%.4f"),
      Gen.oneOf("", " ", "-", "+", ".", "1.2.3", "4e2", "e4", "abc",
        "12abc", "  42  ", "+007", "-0", ".5", "5.",
        // Java-only literal forms Python float() rejects
        "1.0f", "2d", "42F", "0x1p3", "-0X2A",
        // Python's special float spellings
        "inf", "Infinity", "-INF", "+infinity"),
      for {
        sign <- Gen.oneOf("", "+", "-")
        a <- Gen.choose(0, 99999)
        dot <- Gen.oneOf("", ".")
        b <- Gen.oneOf("", Gen.choose(0, 999).sample.getOrElse(0).toString)
      } yield s"$sign$a$dot$b")
    for {
      pre <- Gen.oneOf("", " ", "\t", "\u00a0")
      c <- core
      post <- Gen.oneOf("", " ", "  ", "\u00a0", "\n")
    } yield pre + c + post
  }

  private val amountGen: Gen[String] = for {
    neg <- Gen.oneOf(false, true)
    thousands <- Gen.oneOf("", ",")
    frac <- Gen.oneOf("", ".00", ".5", ",25")
    n <- Gen.choose(0, 9999999)
    space <- Gen.oneOf("", " ", " ", " ")
    junk <- Gen.oneOf("", "", "", "x")
  } yield {
    val base = if (thousands.isEmpty) n.toString
      else n.toString.reverse.grouped(3).mkString(",").reverse
    val s = base + frac + junk
    val spaced = s.patch(s.length / 2, space, 0)
    if (neg) s"($spaced)" else spaced
  }

  private val boolGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("yes", "Y", "TRUE", "t", "1", "oui", "VRAI", "no", "0",
      "false", "", " ", "maybe", "Yes ", " true"),
    Gen.alphaStr.map(_.take(6)))

  // ------------------------------------------------------------ properties

  test("str2intnullable ≡ Python int(v.strip()) on 500 random inputs") {
    val xs = samples(numericJunk)
    val got = xs.toDF("v").select(P.str2intnullable($"v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    xs.zip(got).foreach { case (s, g) =>
      assert(g == modelInt(s), s"str2intnullable(${s.inspect})")
    }
  }

  test("str2floatnullable ≡ Python float(v.strip()) on 500 random inputs") {
    val xs = samples(numericJunk)
    val got = xs.toDF("v").select(P.str2floatnullable($"v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    xs.zip(got).foreach { case (s, g) =>
      assert(g == modelFloat(s), s"str2floatnullable(${s.inspect})")
    }
  }

  test("str2intamount / str2floatamount ≡ reference on random amounts") {
    for (fmt <- Seq("en_US", "fr_FR")) {
      val xs = samples(amountGen)
      val got = xs.toDF("v")
        .select(P.str2intamount($"v", fmt), P.str2floatamount($"v", fmt))
        .collect()
      xs.zip(got).foreach { case (s, r) =>
        assert(r.getLong(0) == modelIntAmount(s, fmt),
          s"str2intamount(${s.inspect}, $fmt)")
        assert(math.abs(r.getDouble(1) - modelFloatAmount(s, fmt)) < 1e-9,
          s"str2floatamount(${s.inspect}, $fmt)")
      }
    }
  }

  test("str2bool ≡ reference truthy set on random inputs") {
    val xs = samples(boolGen)
    val got = xs.toDF("v").select(P.str2bool($"v")).collect()
      .map(_.getBoolean(0))
    xs.zip(got).foreach { case (s, g) =>
      assert(g == modelBool(s), s"str2bool(${s.inspect})")
    }
  }

  // ---- date family: model of parseShittyDate/DateTime (formatting.py:300,
  // :360 — the CODE branches, which beat the docstring where they differ) --

  private def tryPat(t: String, pat: String): Option[java.time.LocalDateTime] = {
    val f = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(pat)
      .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(java.util.Locale.ROOT)
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    try Some(java.time.LocalDateTime.parse(t, f))
    catch { case _: java.time.format.DateTimeParseException => None }
  }

  private val MaxDt = java.time.LocalDateTime.of(9999, 12, 31, 23, 59, 59)

  private def modelDate(s: String, fmt: String): Option[java.time.LocalDateTime] = {
    val t = pyStrip(s)
    val fr = fmt == "fr_FR"
    if (t.contains("/"))
      tryPat(t, if (fr) "d/M/uuuu" else "M/d/uuuu")
        .orElse(tryPat(t, if (fr) "M/d/uuuu" else "d/M/uuuu"))
    else if (t.contains("."))
      tryPat(t, if (fr) "d.M.uuuu" else "M.d.uuuu")
        .orElse(tryPat(t, if (fr) "M.d.uuuu" else "d.M.uuuu"))
    else if (t == "10000-01-01" || t == "10000-01-01 0:00:00") Some(MaxDt)
    else if (t.isEmpty) None
    else tryPat(t, "u-M-d")
  }

  private def modelDateTime(s: String, fmt: String): Option[java.time.LocalDateTime] = {
    val t = pyStrip(s)
    val us = fmt == "en_US"
    if (t.contains("/"))
      tryPat(t, if (us) "M/d/uuuu H:m:s" else "d/M/uuuu H:m:s")
        .orElse(tryPat(t, if (us) "d/M/uuuu H:m:s" else "M/d/uuuu H:m:s"))
    else if (t.contains("."))
      tryPat(t, if (us) "M.d.uuuu H:m:s" else "d.M.uuuu H:m:s")
        .orElse(tryPat(t, if (us) "d.M.uuuu H:m:s" else "M.d.uuuu H:m:s"))
    else if (t == "10000-01-01 0:00:00") Some(MaxDt)
    else if (t.isEmpty) None
    else tryPat(t, "u-M-d H:m:s")
  }

  private val Out = java.time.format.DateTimeFormatter
    .ofPattern("uuuu-MM-dd HH:mm:ss")

  /** Dates parseable by at least one branch format (the reference RAISES
    * on totally-unparseable input — the distributed analogue is NULL, so
    * those stay out of the differential domain), with ambiguous d/m pairs
    * to stress the primary-then-swapped fallback ordering. */
  private val dateGen: Gen[String] = for {
    y <- Gen.choose(1900, 2099)
    a <- Gen.choose(1, 28)
    b <- Gen.choose(1, 12)
    flip <- Gen.oneOf(false, true)
    (d, m) = if (flip) (b, a) else (a, b)
    pad <- Gen.oneOf(false, true)
    sep <- Gen.oneOf("/", ".", "-")
    sp <- Gen.oneOf("", " ", "  ", "\t", "\n", "\u00a0")
  } yield {
    def two(v: Int) = if (pad) f"$v%02d" else v.toString
    val core = sep match {
      case "-" => f"$y%04d-${two(m)}-${two(d)}"
      case s   => s"${two(d)}$s${two(m)}$s$y"
    }
    sp + core + sp
  }

  private val dateTimeGen: Gen[String] = for {
    d <- dateGen
    h <- Gen.choose(0, 23)
    mi <- Gen.choose(0, 59)
    se <- Gen.choose(0, 59)
    pad <- Gen.oneOf(false, true)
  } yield {
    def two(v: Int) = if (pad) f"$v%02d" else v.toString
    s"${d.trim} ${two(h)}:${two(mi)}:${two(se)}"
  }

  test("parseShittyDate ≡ reference branch logic on 500 random dates") {
    for (fmt <- Seq("fr_FR", "en_US")) {
      val xs = samples(dateGen) ++ Seq("", " ", "10000-01-01")
      val got = xs.toDF("v")
        .select(date_format(P.parseShittyDate($"v", fmt),
          "yyyy-MM-dd HH:mm:ss"))
        .collect().map(r => Option(r.getString(0)))
      xs.zip(got).foreach { case (s, g) =>
        val want = modelDate(s, fmt).map(_.format(Out))
        assert(g == want, s"parseShittyDate(${s.inspect}, $fmt)")
      }
    }
  }

  test("parseShittyDateTime ≡ reference branch logic on 500 random inputs") {
    for (fmt <- Seq("en_US", "fr_FR")) {
      val xs = samples(dateTimeGen) ++ Seq("", "10000-01-01 0:00:00")
      val got = xs.toDF("v")
        .select(date_format(P.parseShittyDateTime($"v", fmt),
          "yyyy-MM-dd HH:mm:ss"))
        .collect().map(r => Option(r.getString(0)))
      xs.zip(got).foreach { case (s, g) =>
        val want = modelDateTime(s, fmt).map(_.format(Out))
        assert(g == want, s"parseShittyDateTime(${s.inspect}, $fmt)")
      }
    }
  }

  private implicit class Inspect(s: String) {
    def inspect: String =
      "\"" + s.flatMap {
        case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
  }
}
