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

  /** int(v.strip()) or None (formatting.py:231). */
  private def modelInt(s: String): Option[Long] = {
    val t = s.trim
    if (IntRe.findFirstIn(t).isDefined)
      try Some(java.lang.Long.parseLong(t)) catch { case _: Exception => None }
    else None
  }

  /** float(v.strip()) or None (formatting.py:265). */
  private def modelFloat(s: String): Option[Double] = {
    val t = s.trim
    if (FloatRe.findFirstIn(t).isDefined) Some(t.toDouble) else None
  }

  /** formatMontant (formatting.py:134): strip, (x) → -x, locale separator
    * normalization, drop spaces incl. U+00A0/U+202F, empty/"-" → "0". */
  private def modelMontant(s: String, fmt: String): String = {
    val stripped = s.trim
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
        "12abc", "  42  ", "+007", "-0", ".5", "5."),
      for {
        sign <- Gen.oneOf("", "+", "-")
        a <- Gen.choose(0, 99999)
        dot <- Gen.oneOf("", ".")
        b <- Gen.oneOf("", Gen.choose(0, 999).sample.getOrElse(0).toString)
      } yield s"$sign$a$dot$b")
    for {
      pre <- Gen.oneOf("", " ", "\t")
      c <- core
      post <- Gen.oneOf("", " ", "  ")
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

  private implicit class Inspect(s: String) {
    def inspect: String =
      "\"" + s.flatMap {
        case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
  }
}
