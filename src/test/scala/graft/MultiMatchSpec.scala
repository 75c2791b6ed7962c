package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.MultiMatch

class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def countOf(text: String, pats: Seq[String],
      ci: Boolean = false): Long =
    Seq(Tuple1(text)).toDF("t")
      .select(MultiMatch.count($"t", pats, ci)).head.getLong(0)

  private def anyOf(text: String, pats: Seq[String],
      ci: Boolean = false): Boolean =
    Seq(Tuple1(text)).toDF("t")
      .select(MultiMatch.any($"t", pats, ci)).head.getBoolean(0)

  test("counts every (position, pattern) match, overlapping included") {
    // "aaa" in "aaaa": positions 0 and 1 (overlap); "aa" at 0,1,2
    assert(countOf("aaaa", Seq("aaa")) == 2L)
    assert(countOf("aaaa", Seq("aa", "aaa")) == 5L)
    // one pattern a suffix of another: both report at the same end
    assert(countOf("xabcy", Seq("abc", "bc")) == 2L)
    // pattern = prefix of another
    assert(countOf("abcd", Seq("ab", "abcd")) == 2L)
    assert(countOf("no hits here", Seq("casino")) == 0L)
  }

  test("failure links cross pattern boundaries") {
    // after mismatching "ab|d" the scan must fall back and still find
    // "bd"? no -- classic vector: patterns {"abce","bcd"} over "abcd"
    assert(countOf("abcd", Seq("abce", "bcd")) == 1L)
    assert(countOf("ushers", Seq("he", "she", "his", "hers")) == 3L)
  }

  test("case-insensitive mode lowers ASCII only") {
    assert(countOf("Free CASINO casino", Seq("casino"), ci = true) == 2L)
    assert(countOf("Free CASINO casino", Seq("casino")) == 1L)
    assert(anyOf("VIAGRA!", Seq("viagra"), ci = true))
    // Unicode stays untouched: 'İ' must not phantom-match ASCII 'i'
    assert(countOf("VİP", Seq("vip"), ci = true) == 0L)
  }

  test("any is a gate: null-safe, empty-safe") {
    val df = Seq(Some("win the lottery now"), Some("clean"), None)
      .toDF("t")
    val out = df.select(
      MultiMatch.any($"t", Seq("lottery", "casino")).as("hit"),
      MultiMatch.count($"t", Seq("lottery", "casino")).as("n"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    assert(out.toSeq == Seq((true, 1L), (false, 0L), (false, 0L)))
    assert(!anyOf("", Seq("x")))
  }

  test("empty or null patterns refuse loudly") {
    intercept[IllegalArgumentException] {
      countOf("x", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      countOf("x", Seq("ok", ""))
    }
  }

  test("randomized: matches a brute-force occurrence count") {
    val rnd = new Random(7)
    val alphabet = "abc"
    def randStr(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 30) {
      val pats = (1 to 5).map(_ => randStr(1 + rnd.nextInt(4))).distinct
      val text = randStr(60)
      val brute = pats.map(p =>
        (0 to text.length - p.length)
          .count(i => text.regionMatches(i, p, 0, p.length)).toLong).sum
      assert(countOf(text, pats) == brute, s"text=$text pats=$pats")
    }
  }

  test("one scan over a corpus frame (the gate shape)") {
    val docs = Seq(
      (1L, "totally fine document"),
      (2L, "click here for free money and casino chips"),
      (3L, "lottery lottery lottery")).toDF("doc_id", "text")
    val kept = docs
      .filter(!MultiMatch.any($"text",
        Seq("casino", "lottery", "free money")))
      .select($"doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }
}
