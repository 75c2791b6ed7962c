package graft

import org.apache.spark.sql.functions._

import graft.operators.RobotsTxt

/** Pins the robots.txt kernel (RFC 9309): group selection by longest
  * matching product token with `*` fallback, most-octets-wins rule
  * precedence with Allow breaking ties, `*`/`$` path patterns,
  * crawl-delay and global sitemaps, hostile-input bounds, and the
  * split parse-once/check-per-URL engine shape. */
class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val sample =
    """# corpus crawler policy
      |User-agent: megabot
      |User-agent: superbot
      |Disallow: /private/
      |Allow: /private/pub*
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /tmp/$
      |Sitemap: https://x.test/sitemap-a.xml
      |
      |User-agent: mega
      |Disallow: /
      |Sitemap: https://x.test/sitemap-b.xml
      |""".stripMargin

  private def check(agent: String, path: String): Boolean =
    Seq((sample, agent, path)).toDF("c", "a", "p")
      .select(RobotsTxt.isAllowed($"c", $"a", $"p"))
      .head().getBoolean(0)

  test("group selection: longest matching token wins over shorter and " +
      "over *, unmatched agents fall to *, no groups at all allow") {
    // "megabot/1.0" matches both "megabot" (7) and "mega" (4): longest
    assert(!check("megabot/1.0", "/private/x"))
    assert(check("megabot/1.0", "/private/pub/doc"))
    assert(check("megabot/1.0", "/tmp/")) // the * group's rule is not its
    // "mega-crawler" matches only "mega": its group disallows all
    assert(!check("mega-crawler", "/anything"))
    // unmatched agent: the * group (Disallow /tmp/$ only)
    assert(!check("otherbot", "/tmp/"))
    assert(check("otherbot", "/tmp/file")) // $ anchored: /tmp/ exactly
    assert(check("otherbot", "/private/x"))
    // empty robots.txt: everything allowed
    assert(Seq(("", "anybot", "/x")).toDF("c", "a", "p")
      .select(RobotsTxt.isAllowed($"c", $"a", $"p")).head().getBoolean(0))
  }

  test("path patterns: * wildcards, $ anchor, most-octets precedence " +
      "with Allow winning ties; empty Disallow matches nothing") {
    import graft.operators.RobotsTxt.{parse, allowedOf, pathMatches}
    assert(pathMatches("/a*b$", "/a-x-b"))
    assert(!pathMatches("/a*b$", "/a-x-b-tail"))
    assert(pathMatches("/a*b", "/a-x-b-tail"))
    assert(pathMatches("/*.php", "/dir/page.php"))
    assert(!pathMatches("/*.php$", "/dir/page.php?q=1"))
    assert(pathMatches("/a**b", "/ab")) // stacked wildcards degrade
    // precedence: longer rule wins regardless of order in the file
    val r1 = parse("User-agent: *\nDisallow: /p\nAllow: /p/ok\n", "bot")
    assert(allowedOf(r1, "/p/ok/x") && !allowedOf(r1, "/p/no"))
    // tie: Allow wins
    val r2 = parse("User-agent: *\nDisallow: /ab\nAllow: /a*\n", "bot")
    assert(allowedOf(r2, "/ab"))
    // empty Disallow = allow-all idiom
    val r3 = parse("User-agent: *\nDisallow:\n", "bot")
    assert(allowedOf(r3, "/anything"))
  }

  test("anchored multi-star rules match the LAST occurrence, not the first") {
    import graft.operators.RobotsTxt.pathMatches
    // first-fit on the final segment would take the early 'b' (pos 3),
    // leave a tail, and wrongly reject — '*' must absorb 'xby'
    assert(pathMatches("/a*b$", "/axbyb"))
    assert(!pathMatches("/a*b$", "/axbyc"))
    // the anchored last segment must still lie AFTER the prior ones
    assert(pathMatches("/ab*ab$", "/abab")) // '*' matches empty
    assert(pathMatches("/ab*ab$", "/abxab"))
    assert(!pathMatches("/abc*bc$", "/abc")) // segments cannot overlap
    // unanchored multi-star: presence in order suffices
    assert(pathMatches("/a*b*c", "/a1b2c3"))
    assert(!pathMatches("/a*b*c", "/a1c2b3"))
  }

  test("RFC 9309 group merge: same-agent groups combine their rules") {
    import graft.operators.RobotsTxt.{allowedOf, parse}
    // two * groups (concatenated files are common): both rule sets apply
    val two = parse(
      "User-agent: *\nDisallow: /one/\n\n" +
        "User-agent: *\nDisallow: /two/\nCrawl-delay: 3\n", "anybot")
    assert(!allowedOf(two, "/one/x") && !allowedOf(two, "/two/x"))
    assert(allowedOf(two, "/three/x"))
    // tied specific groups merge too; delay keeps the first declared
    val tied = parse(
      "User-agent: megabot\nDisallow: /a/\nCrawl-delay: 1\n\n" +
        "User-agent: megabot\nDisallow: /b/\nCrawl-delay: 9\n", "megabot")
    assert(!allowedOf(tied, "/a/x") && !allowedOf(tied, "/b/x"))
    // a longer-token group still REPLACES (selection, not merge)
    val sel = parse(
      "User-agent: mega\nDisallow: /short/\n\n" +
        "User-agent: megabot\nDisallow: /long/\n", "megabot/1.0")
    assert(allowedOf(sel, "/short/x") && !allowedOf(sel, "/long/x"))
  }

  test("crawl-delay (per group, ms) and sitemaps (global) report; " +
      "junk lines and comments never throw") {
    val row = Seq((sample, "superbot")).toDF("c", "a")
      .select(RobotsTxt.rules($"c", $"a").as("r")).select("r.*").head()
    assert(row.getLong(2) == 2500L)
    assert(row.getSeq[String](3) ==
      Seq("https://x.test/sitemap-a.xml", "https://x.test/sitemap-b.xml"))
    // the * group declared no delay: null
    val star = Seq((sample, "nobody")).toDF("c", "a")
      .select(RobotsTxt.rules($"c", $"a").as("r")).select("r.*").head()
    assert(star.isNullAt(2))
    // garbage content degrades to allow-all, never throws
    val junk = "\u0000binary\nno colons here\n:::\nDisallow /x\n"
    assert(Seq((junk, "bot", "/x")).toDF("c", "a", "p")
      .select(RobotsTxt.isAllowed($"c", $"a", $"p")).head().getBoolean(0))
  }

  test("hostile input bounds: a generated megafile keeps the first " +
      "MaxRules rules and parses in one pass") {
    val big = new StringBuilder("User-agent: *\n")
    (0 until RobotsTxt.MaxRules + 500).foreach(i =>
      big.append(s"Disallow: /gen/$i\n"))
    val r = graft.operators.RobotsTxt.parse(big.toString, "bot")
    assert(r.getArray(0).numElements() == RobotsTxt.MaxRules)
    // rules beyond the cap are conservatively absent (allowed)
  }

  test("engine shape: parse once per domain, broadcast to URLs, check " +
      "per row — one join, no per-URL parse") {
    val domains = Seq(
      ("a.test", "User-agent: *\nDisallow: /private/\n"),
      ("b.test", "User-agent: *\nDisallow: /\nAllow: /docs/\n"))
      .toDF("domain", "robots")
      .select($"domain", RobotsTxt.rules($"robots", lit("graftbot")).as("r"))
    val urls = Seq(
      ("a.test", "/private/x", false), ("a.test", "/pub/x", true),
      ("b.test", "/docs/d", true), ("b.test", "/other", false))
      .toDF("domain", "path", "want")
    val joined = urls.join(broadcast(domains), "domain")
      .select($"path", $"want",
        RobotsTxt.allowed($"r", $"path").as("got"))
    assert(joined.collect().forall(r => r.getBoolean(1) == r.getBoolean(2)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
