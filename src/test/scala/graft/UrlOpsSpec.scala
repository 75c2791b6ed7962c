package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Pins the URL parse + canonicalization kernel: the documented
  * normalization rules (case, ports, userinfo, dot segments, tracking
  * params, param sort, fragment drop), the full-PSL registered-domain
  * algorithm (exact/wildcard/exception rules over the embedded
  * snapshot, plus direct engine vectors via Psl.fromString), and the
  * crawl-reality contract that NO malformed input ever throws. The driver-facing oracle lives in `url_normalize` (DuckDB
  * recomputes planted variants closed-form); these are the direct
  * vectors. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def partsOf(url: String): Row =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlOps.parts($"u").as("p")).select("p.*").collect().head

  private def norm(url: String): String =
    partsOf(url).getString(7)

  test("canonicalization: case, default port, userinfo, dot segments, " +
      "tracking params, param sort, fragment") {
    assert(norm("HTTPS://u:pw@WWW.Example.COM.:443/a/./b/../c//d" +
      "?utm_source=x&b=2&a=1&gclid=g&#frag") ==
      "https://www.example.com/a/c/d?a=1&b=2")
    // non-default port survives; empty query vanishes; path '' -> '/'
    assert(norm("http://h.example:8080") == "http://h.example:8080/")
    assert(norm("http://h.example:80/p?") == "http://h.example/p")
    // params sort bytewise on the whole token, values kept verbatim
    assert(norm("http://h/?b=1&a=2&a=10") == "http://h/?a=10&a=2&b=1")
    // utm_* by prefix, listed names exactly; names match case-insensitively
    assert(norm("http://h/?UTM_CAMPAIGN=c&FBCLID=f&keep=1") ==
      "http://h/?keep=1")
    // percent-escapes pass through undecoded
    assert(norm("http://h/a%2Fb?q=%20x") == "http://h/a%2Fb?q=%20x")
    // trailing slash and trailing /.. /. resolve like RFC 3986
    assert(norm("http://h/a/b/") == "http://h/a/b/")
    assert(norm("http://h/a/b/..") == "http://h/a/")
    assert(norm("http://h/../a") == "http://h/a")
    // '?' inside the fragment is fragment text, not a query
    assert(norm("http://h/p#frag?x=1") == "http://h/p")
  }

  test("hosts: IPv6 brackets, IPv4, invalid ports stay in host text, " +
      "bad schemes pass through") {
    val v6 = partsOf("http://[2001:DB8::1]:8080/x")
    assert(v6.getString(1) == "[2001:db8::1]")
    assert(v6.getInt(2) == 8080)
    assert(v6.getString(6) == "[2001:db8::1]")
    assert(norm("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x")
    // a non-numeric or oversized port is not a port: verbatim host text
    assert(partsOf("http://h:99999999/x").getString(1) == "h:99999999")
    assert(partsOf("http://h:abc/x").getString(1) == "h:abc")
    // schemeless / non-hierarchical inputs: all fields null, normalized
    // = trimmed input (never throws)
    for (bad <- Seq("mailto:a@b.c", "not a url", "", "   ", "://x",
        "1http://x", "http:/one-slash", "//proto-relative.example/p")) {
      val r = partsOf(bad)
      assert(r.isNullAt(0) && r.isNullAt(1), s"input: '$bad'")
      assert(r.getString(7) == bad.trim, s"input: '$bad'")
    }
    // null column stays null
    assert(Seq(Tuple1(null: String)).toDF("u")
      .select(UrlOps.normalize($"u")).collect().head.isNullAt(0))
  }

  test("registered domain: full PSL — private-section suffixes " +
      "(github.io class), wildcard *.ck, exception !www.ck") {
    val cases = Seq(
      // private section: platform tenants are distinct sites
      "https://alice.github.io/p" -> "alice.github.io",
      "https://a.b.alice.github.io/" -> "alice.github.io",
      "https://github.io/" -> "github.io", // the suffix itself
      "https://myblog.blogspot.com/" -> "myblog.blogspot.com",
      "https://bucket.s3.amazonaws.com/" -> "bucket.s3.amazonaws.com",
      "https://app.herokuapp.com/" -> "app.herokuapp.com",
      // wildcard rule *.ck: anything.ck is itself a public suffix
      "http://www.city.ck/" -> "www.city.ck",
      "http://city.ck/" -> "city.ck", // IS a public suffix: pass-through
      // exception rule !www.ck beats the wildcard: suffix = ck
      "http://www.ck/" -> "www.ck",
      "http://a.www.ck/" -> "www.ck",
      // wildcard *.np (no exception)
      "http://example.com.np/x" -> "example.com.np",
      // 3-label ICANN rules resolve deeper than the lite 2-label set
      "http://a.b.example.police.uk/" -> "example.police.uk",
      // unlisted TLD falls to the implicit * default rule
      "http://deep.sub.example.zz/" -> "example.zz")
    for ((u, want) <- cases)
      assert(partsOf(u).getString(6) == want, s"input: $u")
  }

  test("PSL engine: fromString parses the official format and applies " +
      "exception > longest > default precedence") {
    import graft.operators.UrlOps.Psl
    val rules = Psl.fromString(
      """// comment line
        |com
        |co.uk
        |*.ck
        |!www.ck
        |github.io
        |""".stripMargin)
    def ps(host: String): Int =
      Psl.publicSuffixLabels(host.split("\\.", -1), rules)
    assert(ps("a.b.com") == 1)
    assert(ps("a.b.co.uk") == 2)
    assert(ps("x.github.io") == 2)
    assert(ps("a.city.ck") == 2) // wildcard: city.ck is public
    assert(ps("a.www.ck") == 1) // exception: ck is the suffix
    assert(ps("example.zz") == 1) // default * rule
    // the embedded snapshot actually loaded (not the lite fallback):
    // wildcard and exception sets are non-empty only in the snapshot
    assert(Psl.rules.wildcard.contains("ck"))
    assert(Psl.rules.exception.contains("www.ck"))
    assert(Psl.rules.exact.contains("github.io"))
    assert(Psl.rules.exact.contains("co.uk"))
  }

  test("ports reject non-ASCII Unicode digits (the parseInt trap)") {
    // Arabic-Indic digits: Char.isDigit accepts them and parseInt
    // parses them — the documented rule is ASCII-only, so this is NOT
    // a port and the text stays in the host verbatim
    val r = partsOf("http://h:\u0668\u0660/x")
    assert(r.isNullAt(2), "no port must parse")
    assert(r.getString(1) == "h:\u0668\u0660")
    // and the IPv4 check rejects them too (falls to domain rules)
    assert(partsOf("http://1\u0660.2.3.4/").getString(1) ==
      "1\u0660.2.3.4")
  }

  test("registered domain: core rules (multi-label ICANN suffixes, " +
      "default-rule TLDs), IPs map to themselves") {
    val cases = Seq(
      "http://www.foo.co.uk/" -> "foo.co.uk",
      "http://a.b.foo.co.uk/" -> "foo.co.uk",
      "http://foo.co.uk/" -> "foo.co.uk",
      "http://co.uk/" -> "co.uk", // too few labels: the host itself
      "http://x.com/" -> "x.com",
      "http://a.b.x.com/" -> "x.com",
      "http://localhost/" -> "localhost",
      "http://192.168.0.1/" -> "192.168.0.1",
      "http://256.1.2.3/" -> "2.3", // not an IPv4: default 2-label rule
      "http://news.shop.example.com.au/" -> "example.com.au")
    for ((u, want) <- cases)
      assert(partsOf(u).getString(6) == want, s"input: $u")
  }

  test("normalization is idempotent on every vector") {
    val vectors = Seq(
      "HTTPS://u:pw@WWW.Example.COM.:443/a/./b/../c//d?utm_source=x&b=2&a=1#f",
      "http://h.example:8080", "http://h/?b=1&a=2&a=10",
      "http://[2001:DB8::1]:8080/x", "http://h:abc/x",
      "http://h/a%2Fb?q=%20x", "http://h/a/b/..", "http://h/p#frag?x=1",
      "ftp://files.example.com:21/pub/", "not a url")
    for (v <- vectors) {
      val once = norm(v)
      assert(norm(once) == once, s"input: $v -> $once")
    }
  }

  test("the faces compose scan-side: one projection carries normalize " +
      "+ host + registered domain with no shuffle") {
    val df = (0 until 64).map(i =>
      s"HTTP://WWW.Site${i % 5}.Co.UK/p/$i?utm_medium=m&q=$i")
      .toDF("u")
      .select(UrlOps.normalize($"u").as("n"), UrlOps.host($"u").as("h"),
        UrlOps.registeredDomain($"u").as("d"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "scan-side projection must not shuffle")
    val rows = df.collect()
    assert(rows.length == 64)
    assert(rows.forall(r => r.getString(0).startsWith("http://www.site")))
    assert(rows.map(_.getString(2)).distinct.sorted.toSeq ==
      (0 until 5).map(i => s"site$i.co.uk"))
    // per-domain capping + URL-exact dedup: the pipeline faces
    val capped = df.groupBy($"d").count()
    assert(capped.collect().forall(_.getLong(1) > 0))
  }
}
