package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkExtract

class LinkExtractSpec extends SparkSpec {
  import spark.implicits._

  private val base = "https://www.example.com/dir/page.html?s=1"

  private def linksOf(html: String, b: String = base)
      : Seq[(String, String, Boolean)] =
    Seq((html, b)).toDF("html", "base")
      .select(explode(LinkExtract.links($"html", $"base")).as("l"))
      .select($"l.url", $"l.anchor", $"l.nofollow")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))

  test("resolution vectors: absolute, scheme-relative, root, relative, query") {
    val html =
      """<a href="https://abs.test/x?b=2&amp;a=1">Abs <b>Link</b></a>
        |<a href='//cdn.test/lib'>proto</a>
        |<a href="/root/doc.html">root</a>
        |<a href="../up/1">up</a>
        |<a href="sib?x=2">sib</a>
        |<a href="?y=3">q only</a>""".stripMargin
    assert(linksOf(html) == Seq(
      ("https://abs.test/x?b=2&a=1", "Abs Link", false),
      ("https://cdn.test/lib", "proto", false),
      ("https://www.example.com/root/doc.html", "root", false),
      ("https://www.example.com/up/1", "up", false),
      ("https://www.example.com/dir/sib?x=2", "sib", false),
      ("https://www.example.com/dir/page.html?y=3", "q only", false)))
  }

  test("non-edges drop: javascript/mailto/data/tel/fragment/empty/bare <a>") {
    val html =
      """<a href="javascript:void('http://not.a.link')">js</a>
        |<a href="mailto:x@y.z">mail</a>
        |<a href="data:text/plain,hi">data</a>
        |<a href="tel:+155512">tel</a>
        |<a href="#frag">frag</a>
        |<a href="">empty</a>
        |<a name="anchor">bare</a>
        |<a href="ok">keep</a>""".stripMargin
    assert(linksOf(html) ==
      Seq(("https://www.example.com/dir/ok", "keep", false)))
  }

  test("rel=nofollow token parses case-insensitively among other tokens") {
    val html =
      """<a rel="NoFollow ugc" href="/a">one</a>
        |<a href="/b" rel=nofollow>two</a>
        |<a href="/c" rel="sponsored">three</a>
        |<a href="/d" rel="nofollowing">four</a>""".stripMargin
    assert(linksOf(html).map(l => (l._1.split('/').last, l._3)) ==
      Seq(("a", true), ("b", true), ("c", false), ("d", false)))
  }

  test("malformed markup degrades: script/comment links skip, quotes, nesting") {
    val html =
      """<script>var a = '<a href="/fake1">x</a>';</script>
        |<!-- <a href="/fake2">y</a> -->
        |<a href="/q?gt=a>b" title="a > b">angle</a>
        |<a href="/outer">out <a href="/inner">in</a>
        |<a href="/dangling">dangle<p>after block
        |<a href="/unterminated">tail""".stripMargin
    assert(linksOf(html) == Seq(
      ("https://www.example.com/q?gt=a>b", "angle", false),
      ("https://www.example.com/outer", "out", false),
      ("https://www.example.com/inner", "in", false),
      ("https://www.example.com/dangling", "dangle", false),
      ("https://www.example.com/unterminated", "tail", false)))
  }

  test("anchor text: entities decode, inline tags strip, whitespace collapses") {
    val html = "<a href=\"/e\">Caf&eacute;? &amp;\n  <i>co</i>&#33;</a>"
    // &eacute; is not in the bounded named table -> literal; &amp;/&#33; decode
    assert(linksOf(html) ==
      Seq(("https://www.example.com/e", "Caf&eacute;? & co!", false)))
  }

  test("null/absent base: relative refs drop, absolute refs survive") {
    val html = """<a href="/rel">r</a><a href="http://a.test/x">abs</a>"""
    val out = Seq((html, Option.empty[String])).toDF("html", "base")
      .select(explode(LinkExtract.links($"html", $"base")).as("l"))
      .select($"l.url").as[String].collect().toSeq
    assert(out == Seq("http://a.test/x"))
  }

  test("scalar resolve face + null safety") {
    val df = Seq(
      (base, "../x"),
      (base, "HTTPS://UP.CASE/p/../q"),
      (base, "javascript:alert('http://x.y/')"),
      (null.asInstanceOf[String], "/abs-no-base")
    ).toDF("base", "ref")
    val out = df.select(LinkExtract.resolve($"base", $"ref")).collect()
      .map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(
      Some("https://www.example.com/x"),
      Some("https://UP.CASE/q"), // scheme lowercases; authority verbatim
      None,
      None))
  }
}
