package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Pins the URL parse + canonicalization kernel: the documented
  * normalization rules (case, ports, userinfo, dot segments, tracking
  * params, param sort, fragment drop), the PSL-lite registered-domain
  * rule, and the crawl-reality contract that NO malformed input ever
  * throws. The driver-facing oracle lives in `url_normalize` (DuckDB
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

  test("registered domain: PSL-lite (multi-label suffixes keep 3 " +
      "labels, default 2), IPs map to themselves") {
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
