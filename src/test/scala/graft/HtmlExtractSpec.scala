package graft

import org.apache.spark.sql.functions._

import graft.operators.HtmlExtract

/** Pins the HTML one-pass extraction kernel's semantics: block
  * segmentation, script/style/comment stripping, entity decoding, link
  * density accounting, and — the crawl-reality contract — that NO
  * malformed markup ever throws (truncated tags, stray `<`, bad
  * entities, unterminated scripts all degrade to deterministic text).
  * The driver-facing oracle lives in `text_html` (DuckDB recomputes the
  * extraction of PLANTED markup in closed form); these are the direct
  * vectors. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def blocksOf(html: String): Seq[(String, Long, Long)] =
    Seq(Tuple1(html)).toDF("h")
      .select(explode(HtmlExtract.blocks($"h")).as("b"))
      .select($"b.text", $"b.chars", $"b.link_chars")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  private def textOf(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExtract.text($"h")).collect().head.getString(0)

  test("block segmentation: block tags split, inline tags vanish") {
    val got = blocksOf(
      "<html><body><h1>Title Here</h1><p>one <b>bold</b> two</p>" +
        "<div>three</div>tail</body></html>")
    assert(got.map(_._1) == Seq("Title Here", "one bold two", "three",
      "tail"))
  }

  test("script, style, comments, doctype and directives strip " +
      "(even containing '<')") {
    val html = "<!DOCTYPE html><?xml version='1.0'?><head>" +
      "<style>p { width: 1 < 2; }</style>" +
      "<SCRIPT>if (a < b) { x = '</p>'; }</SCRIPT></head>" +
      "<!-- a <p>comment</p> --><p>kept</p>"
    assert(textOf(html) == "kept")
  }

  test("entities: named, numeric, hex, nbsp; unknown and unterminated " +
      "stay literal") {
    assert(textOf("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65;&#x42; " +
      "x&nbsp;y</p>") == "a & b <c> \"d\" AB x y")
    assert(textOf("<p>5 &undefined; &amp 6 &; &toolongtobeanentityx; " +
      "7&</p>") == "5 &undefined; &amp 6 &; &toolongtobeanentityx; 7&")
  }

  test("link density: anchor text counts per block, block boundary " +
      "resets a dangling <a>") {
    val got = blocksOf("<p><a href='/x?a=1&b=2'>nav link</a> tail</p>" +
      "<p>clean prose</p><p><a href=x>open anchor<p>next block</p>")
    // block 1: "nav link tail" — link chars = "nav link".length = 8
    assert(got(0) == (("nav link tail", 13L, 8L)))
    assert(got(1) == (("clean prose", 11L, 0L)))
    // the unclosed <a> counts inside its own block...
    assert(got(2) == (("open anchor", 11L, 11L)))
    // ...but the <p> boundary closes it: the next block is NOT a link
    assert(got(3) == (("next block", 10L, 0L)))
  }

  test("quoted attributes may contain '>'") {
    assert(textOf("""<p title="a > b">guarded</p>""") == "guarded")
    assert(textOf("<p title='x > y'>apos</p>") == "apos")
  }

  test("whitespace collapses inside a block; ws-only blocks drop") {
    assert(blocksOf("<p>  a \t\n  b  </p>\n\n<p>   </p><p>c</p>")
      .map(_._1) == Seq("a b", "c"))
  }

  test("malformed markup never throws: stray '<', truncated tags, " +
      "unterminated script/comment, empty and null input") {
    assert(textOf("2 < 3 and <3 hearts") == "2 < 3 and <3 hearts")
    assert(textOf("truncated <p") == "truncated")
    assert(textOf("<p>cut <a href=") == "cut")
    assert(textOf("<script>never closed") == "")
    assert(textOf("<!-- never closed <p>x</p>") == "")
    assert(textOf("") == "")
    assert(textOf("<>") == "<>")
    // null html → empty blocks array, not null, not a throw
    val n = Seq(Tuple1(null: String)).toDF("h")
      .select(size(HtmlExtract.blocks($"h"))).collect().head.getInt(0)
    assert(n == 0)
  }

  test("mainText: the link-density gate drops nav/footer link farms " +
      "and keeps prose") {
    val html = "<div><a href=/>Home</a> <a href=/a>About</a> " +
      "<a href=/c>Contact</a></div>" +
      "<p>This is the actual article body with enough words.</p>" +
      "<footer><a href=/t>Terms</a> | <a href=/p>Privacy</a></footer>"
    val main = Seq(Tuple1(html)).toDF("h")
      .select(HtmlExtract.mainText($"h", maxLinkDensity = 0.5))
      .collect().head.getString(0)
    assert(main == "This is the actual article body with enough words.")
    // and the unfiltered view keeps everything
    assert(textOf(html).startsWith("Home About Contact"))
  }

  test("Curate composes over extracted HTML text ahead of quality/lang") {
    val docs = Seq(
      (1L, "<html><body><p>the quick brown fox jumps over the lazy " +
        "dog and the cat sat on the mat with the happy dog</p>" +
        "<script>var x = 1;</script></body></html>"),
      (2L, "<p>&lt;&gt;&amp;</p>") // decodes to symbol soup: low quality
    ).toDF("doc_id", "html")
    val kept = graft.operators.Curate(docs,
      minQuality = 0.3, langs = Seq("en"),
      text = HtmlExtract.mainText(col("html")))
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("metaRobots/noindex: both attribute orders, case and quoting " +
      "variants parse; token boundaries hold; absence and junk are " +
      "safe") {
    def rob(html: String): (String, Boolean) = {
      val r = Seq(Tuple1(html)).toDF("h")
        .select(HtmlExtract.metaRobots(col("h")).as("d"),
          HtmlExtract.noindex(col("h")).as("n"))
        .head()
      (r.getString(0), r.getBoolean(1))
    }
    // canonical, reversed order, unquoted name, uppercase
    assert(rob("<meta name=\"robots\" content=\"noindex,nofollow\">") ==
      ("noindex,nofollow", true))
    assert(rob("<META content='none' NAME='ROBOTS'>") == ("none", true))
    assert(rob("<meta name=robots content=\"NOINDEX\">") ==
      ("noindex", true))
    // allowed directives do not gate; token boundary: noindexing is
    // not noindex
    assert(rob("<meta name=\"robots\" content=\"index, follow\">") ==
      ("index, follow", false))
    assert(rob("<meta name=\"robots\" content=\"noindexing\">") ==
      ("noindexing", false))
    // a googlebot-scoped meta is NOT the generic robots directive
    assert(rob("<meta name=\"googlebot\" content=\"noindex\">") ==
      ("", false))
    // UNQUOTED content values are legal HTML and must gate too
    assert(rob("<meta name=robots content=noindex>") ==
      ("noindex", true))
    assert(rob("<meta content=none name=robots>") == ("none", true))
    assert(rob("<meta name=robots content=all>") == ("all", false))
    // absence, NULL-ish, junk
    assert(rob("<html><body>no meta at all</body></html>") ==
      ("", false))
    assert(rob("<meta name=\"robots\"") == ("", false))
    val nullRow = Seq(Tuple1(null: String)).toDF("h")
      .select(HtmlExtract.noindex(col("h"))).head()
    assert(!nullRow.getBoolean(0))
  }

  test("script/style prefix boundary: custom elements like " +
      "<style-guide> are ordinary tags, never raw-text swallowers; " +
      "</script-card> does not close a real <script>; \\x0B is not " +
      "whitespace (the RE2 \\s set)") {
    def txt(html: String): String =
      Seq(Tuple1(html)).toDF("h")
        .select(HtmlExtract.text(col("h"))).head().getString(0)
    // custom element with a style- prefix: content survives
    assert(txt("<body><style-guide>Design notes</style-guide>" +
      "<p>Real body</p></body>") == "Design notes\nReal body")
    // ...even when no literal </style ever follows (would have
    // swallowed the rest of the document)
    assert(txt("<body><script-card>Widget</script-card>" +
      "<p>after</p></body>") == "Widget\nafter")
    // a </script-card> inside a REAL script does not close it
    assert(txt("<script>var x = '</script-card>';</script>" +
      "<p>visible</p>") == "visible")
    // vertical tab passes through as TEXT (RE2 \s excludes it, so the
    // DuckDB oracle would keep it too — the kernel must agree)
    assert(txt("<p>a\u000Bb</p>") == "a\u000Bb")
  }
}
