package graft

import org.apache.spark.sql.functions._

import graft.operators.Sitemap

/** Pins the sitemap kernel (sitemaps.org protocol): urlset vs
  * sitemapindex entry kinds, field extraction with entity/CDATA
  * handling, malformed-markup degradation, and the 50k protocol
  * bound. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entriesOf(xml: String) =
    Seq(Tuple1(xml)).toDF("x")
      .select(explode(Sitemap.entries($"x")).as("e"))
      .select($"e.loc", $"e.lastmod", $"e.changefreq", $"e.priority",
        $"e.kind")
      .collect().toSeq

  test("urlset: loc/lastmod/changefreq/priority extract; entities and " +
      "CDATA decode; missing fields are null") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <url>
        |  <loc>https://x.test/a?q=1&amp;r=2</loc>
        |  <lastmod>2025-01-03</lastmod>
        |  <changefreq>daily</changefreq>
        |  <priority>0.8</priority>
        | </url>
        | <url><loc><![CDATA[https://x.test/b]]></loc></url>
        |</urlset>""".stripMargin
    val got = entriesOf(xml)
    assert(got.size == 2)
    assert(got(0).getString(0) == "https://x.test/a?q=1&r=2")
    assert(got(0).getString(1) == "2025-01-03")
    assert(got(0).getString(2) == "daily")
    assert(got(0).getDouble(3) == 0.8)
    assert(got(0).getString(4) == "url")
    assert(got(1).getString(0) == "https://x.test/b")
    assert(got(1).isNullAt(1) && got(1).isNullAt(2) && got(1).isNullAt(3))
  }

  test("sitemapindex: entries carry kind=sitemap so the frontier " +
      "knows to recurse") {
    val xml =
      """<sitemapindex>
        | <sitemap><loc>https://x.test/sm1.xml</loc>
        |   <lastmod>2025-02-01</lastmod></sitemap>
        | <sitemap><loc>https://x.test/sm2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = entriesOf(xml)
    assert(got.map(_.getString(0)) ==
      Seq("https://x.test/sm1.xml", "https://x.test/sm2.xml"))
    assert(got.forall(_.getString(4) == "sitemap"))
  }

  test("malformed markup degrades, never throws: entries before the " +
      "damage survive, junk priorities are null, case-insensitive tags") {
    val xml = "<URLSET><URL><LOC>https://x.test/up</LOC>" +
      "<PRIORITY>high</PRIORITY></URL><url><loc></loc></url>" +
      "<url>no loc here</url><url><loc>https://x.test/tail"
    val got = entriesOf(xml)
    // entry 1: uppercase tags, junk priority -> null; entry 2: empty
    // loc drops; entry 3: no loc drops; entry 4: unclosed loc clamps
    assert(got.map(_.getString(0)) ==
      Seq("https://x.test/up", "https://x.test/tail"))
    assert(got(0).isNullAt(3))
    // garbage input: zero entries, no throw
    assert(entriesOf("not xml at all & < >").isEmpty)
    assert(entriesOf("").isEmpty)
  }

  test("the protocol's 50k bound holds against generated megafiles") {
    val sb = new StringBuilder("<urlset>")
    (0 until 50100).foreach(i =>
      sb.append(s"<url><loc>https://x.test/$i</loc></url>"))
    sb.append("</urlset>")
    val arr = graft.operators.Sitemap.parse(sb.toString)
    assert(arr.numElements() == Sitemap.MaxEntries)
  }
}
