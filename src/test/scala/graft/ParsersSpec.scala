package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{FormatList, Parsers => P}

/** Mirrors reference tests/formatting_test.py value-for-value. */
class ParsersSpec extends SparkSpec {
  import spark.implicits._

  /** Applies `f` to each input string (null allowed) and returns results. */
  private def run(f: Column => Column, vals: Seq[String]): Seq[Any] = {
    val df = vals.map(Option(_)).zipWithIndex.toDF("v", "i")
    df.orderBy("i").select(f(col("v"))).collect().toSeq
      .map(r => if (r.isNullAt(0)) null else r.get(0))
  }

  private def check(f: Column => Column, cases: (String, Any)*): Unit = {
    val got = run(f, cases.map(_._1))
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((exp, g), i) =>
      assert(g == exp, s"input '${cases(i)._1}' expected $exp got $g")
    }
  }

  test("str2bool") {
    check(P.str2bool,
      "" -> false, " " -> false, "YES" -> true, "TRUE" -> true,
      "NO" -> false, "FALSE" -> false, "t" -> true, "1" -> true,
      "oui" -> true, "VRAI" -> true, null.asInstanceOf[String] -> false)
  }

  test("str2boolnullable") {
    check(P.str2boolnullable,
      "" -> null, " " -> false, "YES" -> true, "TRUE" -> true,
      "NO" -> false, "FALSE" -> false, (null: String) -> null)
  }

  test("str2strnullable") {
    check(P.str2strnullable(_),
      "" -> null, " " -> null, "foobar" -> "foobar",
      "  foobar  " -> "foobar")
    check(P.str2strnullable(_, Some(2)),
      "foobar" -> "fo", "  foobar  " -> "fo", "" -> null, " " -> null)
  }

  test("str2intnullable") {
    check(P.str2intnullable,
      "" -> null, "42" -> 42L, "42.56" -> null, "foobar" -> null,
      " 13 " -> 13L, "+5" -> 5L, "-7" -> -7L)
  }

  test("str2floatnullable") {
    check(P.str2floatnullable,
      "" -> null, "42" -> 42.0, "42.56" -> 42.56, "foobar" -> null,
      ".5" -> 0.5, "1e3" -> 1000.0, " -2.5 " -> -2.5)
  }

  test("formatMontant") {
    check(P.formatMontant(_),
      (null: String) -> "0", "" -> "0", "-" -> "0",
      "(1,000.0)" -> "-1000.0", "-1,000.0" -> "-1000.0", " " -> "0")
    check(P.formatMontant(_, "fr_FR"), "-1 000,0" -> "-1000.0")
  }

  test("str2intamount") {
    check(P.str2intamount(_),
      "" -> 0L, "42" -> 42L, "-1,000" -> -1000L, "-1,000.0" -> 0L)
  }

  test("str2floatamount") {
    check(P.str2floatamount(_),
      "" -> 0.0, "42" -> 42.0, "-1,000" -> -1000.0, "-1,000.0" -> -1000.0)
  }

  private def fmt(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  test("parseShittyDate") {
    check(c => fmt(P.parseShittyDate(c)),
      "" -> null,
      "02/01/2020" -> "2020-01-02 00:00:00",
      "02.01.2020" -> "2020-01-02 00:00:00",
      "2020-01-02" -> "2020-01-02 00:00:00",
      "01/24/2020" -> "2020-01-24 00:00:00",
      "01.24.2020" -> "2020-01-24 00:00:00",
      "2020-01-24" -> "2020-01-24 00:00:00",
      "10000-01-01" -> "9999-12-31 23:59:59",
      "10000-01-01 0:00:00" -> "9999-12-31 23:59:59")
    check(c => fmt(P.parseShittyDate(c, "en_US")),
      "01/02/2020" -> "2020-01-02 00:00:00",
      "01.02.2020" -> "2020-01-02 00:00:00",
      "24/01/2020" -> "2020-01-24 00:00:00",
      "24.01.2020" -> "2020-01-24 00:00:00")
  }

  test("parseShittyDateAsDate") {
    check(c => date_format(P.parseShittyDateAsDate(c), "yyyy-MM-dd"),
      "" -> null, "02/01/2020" -> "2020-01-02",
      "10000-01-01" -> "9999-12-31")
  }

  test("parseShittyDateTime") {
    check(c => fmt(P.parseShittyDateTime(c, "fr_FR")),
      "" -> null,
      "02/01/2020 03:04:05" -> "2020-01-02 03:04:05",
      "02.01.2020 03:04:05" -> "2020-01-02 03:04:05",
      "2020-01-02 03:04:05" -> "2020-01-02 03:04:05",
      "01/24/2020 03:04:05" -> "2020-01-24 03:04:05",
      "01.24.2020 03:04:05" -> "2020-01-24 03:04:05")
    check(c => fmt(P.parseShittyDateTime(c)),
      "01/02/2020 03:04:05" -> "2020-01-02 03:04:05",
      "01.02.2020 03:04:05" -> "2020-01-02 03:04:05",
      "24/01/2020 03:04:05" -> "2020-01-24 03:04:05",
      "24.01.2020 03:04:05" -> "2020-01-24 03:04:05",
      "10000-01-01 0:00:00" -> "9999-12-31 23:59:59")
  }

  test("parseShittyTime") {
    check(P.parseShittyTime,
      "" -> null, "01:02:03" -> 3723L, "23:59:59" -> 86399L)
  }

  test("dumpDatetime") {
    val ts = Seq("2020-01-02 03:04:05").toDF("v")
      .select(to_timestamp(col("v")).as("t"))
    assert(ts.select(P.dumpDatetime(col("t"))).head.getString(0)
      == "2020-01-02T03:04:05")
    assert(ts.select(P.dumpDatetime(col("t"), "gs")).head.getString(0)
      == "2020-01-02 03:04:05")
    assert(ts.select(P.dumpDatetime(col("t"), "dd/MM/yyyy")).head.getString(0)
      == "02/01/2020")
    // strftime passthrough (formatting.py:36; tests/formatting_test.py:40)
    assert(ts.select(P.dumpDatetime(col("t"), "%d/%m/%Y")).head.getString(0)
      == "02/01/2020")
    assert(ts.select(P.dumpDatetime(col("t"), "%Y-%m-%dT%H:%M:%S%z"))
      .head.getString(0) == "2020-01-02T03:04:05") // naive: %z → ''
    assert(ts.select(P.dumpDatetime(col("t"), "at %H:%M on %d.%m."))
      .head.getString(0) == "at 03:04 on 02.01.")
    assert(ts.select(P.dumpDatetime(col("t"), "%d%%%m")).head.getString(0)
      == "02%01")
  }

  test("strftimeToJava translation") {
    assert(P.strftimeToJava("%d/%m/%Y") == "dd/MM/yyyy")
    assert(P.strftimeToJava("%Y-%m-%dT%H:%M:%S%z")
      == "yyyy-MM-dd'T'HH:mm:ss")
    assert(P.strftimeToJava("at %H h") == "'at 'HH' h'")
    assert(P.strftimeToJava("%%") == "%")
    assert(P.strftimeToJava("%q") == "'%q'")
  }

  test("dumpInt") {
    val df = Seq[Option[Double]](None, Some(0), Some(42), Some(0.45))
      .toDF("v")
    assert(df.select(P.dumpInt(col("v"))).collect().map(_.getString(0)).toSeq
      == Seq("0", "0", "42", "0"))
  }

  test("dumpPercentage") {
    val df = Seq[Option[Double]](None, Some(0), Some(1), Some(0.456),
      Some(0.45678)).toDF("v")
    assert(df.select(P.dumpPercentage(col("v"))).collect()
      .map(_.getString(0)).toSeq == Seq("0.0", "0.0", "100.0", "45.6", "45.7"))
  }

  test("dumpStr") {
    check(P.dumpStr,
      (null: String) -> "-", "" -> "-", "    " -> "-", "1" -> "1")
  }

  test("dumpGps") {
    val df = Seq((48.8566, 2.3522)).toDF("lat", "lng")
      .select(struct(col("lat"), col("lng")).as("p"))
    assert(df.select(P.dumpGps(col("p"))).head.getString(0)
      == "48.856600, 2.352200")
  }

  test("toList") {
    val df = Seq(Seq[String](null, "", "x", "1")).toDF("v")
    assert(df.select(P.toList(col("v"))).head.getSeq[String](0)
      == Seq("x", "1"))
  }

  test("formatList tokenizer (mirrors test_formatList)") {
    def fl(s: String): Seq[String] = FormatList.parse(s, true, true)
    assert(fl(null) == Seq())
    assert(fl("") == Seq())
    assert(fl("val1") == Seq("val1"))
    assert(fl("\"val1\"") == Seq("val1"))
    assert(fl("'val1'") == Seq("val1"))
    assert(fl("val1; val2 et val3") == Seq("val1", "val2", "val3"))
    assert(fl("val1, val2 et val3") == Seq("val1", "val2", "val3"))
    assert(fl("val1, val2; val3 et val4") == Seq("val1", "val2", "val3", "val4"))
    assert(fl(" val1 , val2 et val3 ") == Seq("val1", "val2", "val3"))
    assert(fl(" ,val1 , val2 et val3, ") == Seq("val1", "val2", "val3"))
    assert(fl("val1 (1,2,3), val2 et val3") == Seq("val1 (1,2,3)", "val2", "val3"))
    assert(fl("val1 (1,2,3), \"val2 et val3\"") == Seq("val1 (1,2,3)", "val2, val3"))
    assert(fl("caractères, accentués") == Seq("caractères", "accentués"))
  }

  test("formatList as Column expression") {
    val df = Seq(Option("a; b et c"), None).toDF("v")
    val got = df.select(P.formatList(col("v"))).collect()
      .map(_.getSeq[String](0)).toSeq
    assert(got == Seq(Seq("a", "b", "c"), Seq()))
  }
}
