package graft

import org.apache.spark.sql.functions._

import graft.operators.UnicodeClean

/** Pins the Unicode normalization kernel: NFC composition, zero-width
  * drop, typographic quote/dash/ellipsis/space folds, control strip,
  * newline folding, pass-through of real non-Latin text — and the
  * dedup motivation: byte-distinct spellings hash equal after clean. */
class UnicodeCleanSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(UnicodeClean.clean($"t")).head().getString(0)

  test("NFC: decomposed sequences compose; already-NFC ASCII passes " +
      "through identically (fast path)") {
    assert(cleanOf("café") == "café") // e + combining acute
    assert(cleanOf("plain ascii text\nwith\tlines") ==
      "plain ascii text\nwith\tlines")
  }

  test("typographic folds: quotes, dashes, ellipsis, spaces; " +
      "zero-width and controls drop; \\r\\n folds") {
    assert(cleanOf("“q” ‘s’") == "\"q\" 's'")
    assert(cleanOf("a—b–c−d") == "a-b-c-d")
    assert(cleanOf("wait…") == "wait...")
    assert(cleanOf("a\u00A0b\u2003c\u3000d") == "a b c d")
    assert(cleanOf("z\u200Bw\u200C\u200D\uFEFFx") == "zwx")
    assert(cleanOf("r\r\nn\rm\u0007\u009F.") == "r\nn\nm.")
  }

  test("non-Latin text passes through untouched (normalization, not " +
      "ASCII folding)") {
    val cjk = "日本語 한국어"
    assert(cleanOf(cjk) == cjk)
    val emoji = "ok 😀!"
    assert(cleanOf(emoji) == emoji)
  }

  test("the dedup motivation: byte-distinct spellings of one sentence " +
      "hash EQUAL after clean, distinct before") {
    val a = "The cafe\u0301 \u201Cspecial\u201D \u2014 great\u2026"
    val b = "The café \"special\" - great...\u200B"
    val df = Seq((1L, a), (2L, b)).toDF("id", "t")
      .select($"id", md5($"t").as("raw"),
        md5(UnicodeClean.clean($"t")).as("cleaned"))
    val rows = df.collect()
    assert(rows(0).getString(1) != rows(1).getString(1))
    assert(rows(0).getString(2) == rows(1).getString(2))
    // null safety
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(UnicodeClean.clean($"t")).head().isNullAt(0))
  }
}
