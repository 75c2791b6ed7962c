package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL parsing + canonicalization — the corpus-pipeline face of
  * web-scale ingestion (reference: simpletasks-data has no URL ops; this
  * is part of the engine's WARC → HtmlExtract → curate web story).
  * CCNet/C4-style pipelines dedup BY URL and cap BY registered domain
  * before any content pass, so both need to be cheap scan-side columns.
  *
  * One kernel pass ([[UrlParts]]) renders a struct; every face below is
  * a `getField` over it, so `normalize` + `registeredDomain` in one
  * projection cost one parse (and Catalyst's subexpression elimination
  * collapses repeated faces).
  *
  * Canonicalization is DETERMINISTIC and documented — the DuckDB oracle
  * recomputes it closed-form on planted URLs:
  *  - input trims ASCII whitespace; an input without a valid
  *    `scheme://` prefix (scheme = letter then letters/digits/`+-.`)
  *    passes through: `normalized` = the trimmed input, all parsed
  *    fields null (mailto:, data:, relative refs — not hierarchical);
  *  - scheme and host lowercase; a single trailing dot on the host
  *    drops (`example.com.` ≡ `example.com`); userinfo (`user:pw@`)
  *    strips; an IPv6 `[...]` host keeps its brackets;
  *  - an explicit port parses only if all-digits and ≤ 65535 (else it
  *    stays in the host text verbatim — never throws) and DROPS from
  *    the normalized form when it is the scheme default (http/ws 80,
  *    https/wss 443, ftp 21);
  *  - the path removes dot segments (RFC 3986 remove_dot_segments:
  *    `/a/./b/../c` → `/a/c`; leading `..` above root drops), collapses
  *    repeated slashes (`/a//b` → `/a/b`), and an empty path renders
  *    `/`;
  *  - the query splits on `&`, drops empty params and TRACKING params
  *    (name-insensitive: any `utm_*`, plus gclid, dclid, fbclid,
  *    msclkid, yclid, wbraid, gbraid, igshid, mc_cid, mc_eid, _ga,
  *    ref_src), sorts the survivors bytewise (whole `name=value`
  *    token), and rejoins; zero survivors → no `?`;
  *  - the fragment always drops from `normalized` (reported in the
  *    `fragment` field); percent-escapes pass through UNDECODED
  *    (decoding can change routing semantics — `%2F` is not `/`).
  *
  * `registered_domain` runs the FULL Public Suffix List algorithm
  * ([[UrlOps.Psl]]): exact, wildcard (`*.ck`) and exception (`!www.ck`)
  * rules over an embedded snapshot of publicsuffix.org's list
  * (ICANN + private sections — github.io tenants are distinct sites
  * for per-domain caps), with the implicit `*` default rule for
  * unlisted TLDs; IPs and bracketed IPv6 hosts map to themselves, and
  * a host that IS a public suffix passes through unchanged. The
  * snapshot is a classpath resource in the official file format —
  * replace it with a fresh download to update; the r14 PSL-lite
  * 2-label set remains as the zero-resource fallback.
  *
  * At 100 TB: narrow per-row scan-side work, zero shuffle, zero
  * allocation beyond the output struct; `groupBy(registeredDomain)`
  * for per-domain caps and `dropDuplicates(normalize)` for URL-exact
  * dedup both hash the rendered column, never the raw text. */
case class UrlParts(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = UrlOps.Schema
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    UrlOps.parse(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UrlParts = copy(child = newChild)
}

object UrlOps {

  val Schema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = true),
    StructField("host", StringType, nullable = true),
    StructField("port", IntegerType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("query", StringType, nullable = true),
    StructField("fragment", StringType, nullable = true),
    StructField("registered_domain", StringType, nullable = true),
    StructField("normalized", StringType, nullable = false)))

  /** Tracking parameter names (lowercase, exact) beyond the `utm_`
    * prefix rule. Bounded, documented; extend here, not at call sites. */
  private val Tracking: Set[String] = Set(
    "gclid", "dclid", "fbclid", "msclkid", "yclid", "wbraid", "gbraid",
    "igshid", "mc_cid", "mc_eid", "_ga", "ref_src")

  /** Known 2-label public suffixes — the zero-resource FALLBACK rule
    * table when the PSL snapshot resource is absent from the jar
    * ([[Psl.rules]]); the full engine supersedes it otherwise. */
  private val MultiSuffix: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "com.ph", "com.vn", "com.eg", "com.sa", "com.pk", "com.ng",
    "com.ua", "com.pl", "net.pl", "org.pl",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "co.za", "org.za", "ac.za", "gov.za",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.id", "or.id", "ac.id", "go.id",
    "co.th", "in.th", "ac.th", "go.th",
    "co.il", "org.il", "ac.il", "gov.il",
    "com.co", "com.pe", "com.ec", "com.uy", "com.ve", "com.bd",
    "com.np", "com.kh", "com.mm", "com.et", "com.gh", "com.ke",
    "co.ke", "co.tz", "co.ug", "co.zw")

  private def defaultPort(scheme: String): Int = scheme match {
    case "http" | "ws" => 80
    case "https" | "wss" => 443
    case "ftp" => 21
    case _ => -1
  }

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  private def lowerAscii(s: String): String = {
    var i = 0
    var changed = false
    while (i < s.length && !changed) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z') changed = true else i += 1
    }
    if (!changed) s
    else {
      val b = new java.lang.StringBuilder(s)
      var j = i
      while (j < b.length) {
        val c = b.charAt(j)
        if (c >= 'A' && c <= 'Z') b.setCharAt(j, (c + 32).toChar)
        j += 1
      }
      b.toString
    }
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, allocation-light. */
  private[operators] def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    // split keeping structure: segments BETWEEN slashes; leading '/'
    // tracked separately (corpus URLs are absolute-path)
    val abs = path.charAt(0) == '/'
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (s == "." || (s.isEmpty && i > 0 && i < segs.length - 1)) {
        // "." and empty interior segments ("//") collapse; a TRAILING
        // empty segment (path ends in '/') is preserved below
        if (s == "." && i == segs.length - 1) out += "" // trailing "/."
      } else if (s == "..") {
        if (out.nonEmpty && out.last.nonEmpty && out.last != "..")
          out.remove(out.length - 1)
        else if (!abs && (out.isEmpty || out.last == ".."))
          out += ".." // relative above root: keep the ..s
        if (i == segs.length - 1) out += "" // trailing "/.."
      } else if (!(s.isEmpty && i == 0)) {
        out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    if (abs) "/" + joined else joined
  }

  /** ASCII-only: Char.isDigit accepts Unicode digit classes (and
    * Integer.parseInt parses them), which would let e.g. `:٨٠` slip
    * through as port 80 — diverging from the documented all-digits
    * ASCII rule and from closed-form oracle replication. */
  private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def isIpv4(host: String): Boolean = {
    val parts = host.split("\\.", -1)
    parts.length == 4 && parts.forall(p =>
      p.nonEmpty && p.length <= 3 && p.forall(isAsciiDigit) && p.toInt <= 255)
  }

  // ------------------------------------------------------------------ PSL

  /** Full Public Suffix List semantics (publicsuffix.org/list — the
    * algorithm every browser and crawler uses), over an embedded
    * snapshot of the list shipped as a classpath resource in the PSL
    * file format (replace the resource with a fresh download to
    * update; the parser is drop-in). Three rule classes:
    *
    *  - exact rules (`co.uk`, `github.io`) — the suffix itself is
    *    public;
    *  - wildcard rules (`*.ck`) — any single label under the base is
    *    public;
    *  - exception rules (`!www.ck`) — carve-outs that BEAT every
    *    matching rule: the public suffix is the rule minus its
    *    leftmost label.
    *
    * Unlisted TLDs fall to the implicit default rule `*` (every bare
    * TLD is a public suffix) — which is why single-label TLDs never
    * appear in the list. The private section (github.io, blogspot.com,
    * …) is INCLUDED: for crawl economics (per-domain caps, dedup keys)
    * two tenants of a shared platform suffix are different sites,
    * which is exactly what the private section encodes.
    *
    * Loaded once per JVM into three hash sets (the snapshot is a few
    * hundred rules; the full list is ~10k — either is a bounded
    * literal-class model riding the executor classpath, never a
    * shuffle). Falls back to the r14 PSL-lite 2-label set if the
    * resource is missing from the deployment jar. */
  private[graft] object Psl {
    final case class Rules(
        exact: Set[String], wildcard: Set[String], exception: Set[String])

    private def parseRules(lines: Iterator[String]): Rules = {
      val exact = Set.newBuilder[String]
      val wild = Set.newBuilder[String]
      val exc = Set.newBuilder[String]
      lines.foreach { raw =>
        // PSL format: rule = first whitespace-separated token; `//`
        // lines are comments; the official file is already
        // lowercase/punycode — lowercased here defensively
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          val rule = lowerAscii(line.split("\\s+")(0))
          if (rule.startsWith("!")) exc += rule.substring(1)
          else if (rule.startsWith("*.")) wild += rule.substring(2)
          else if (rule != "*") exact += rule
        }
      }
      Rules(exact.result(), wild.result(), exc.result())
    }

    /** Spec face: build a rule table from PSL-format text. */
    private[graft] def fromString(text: String): Rules =
      parseRules(text.linesIterator)

    val rules: Rules = {
      val res = getClass.getResourceAsStream(
        "/graft/public_suffix_snapshot.dat")
      if (res == null) Rules(MultiSuffix, Set.empty, Set.empty)
      else try parseRules(scala.io.Source.fromInputStream(res, "UTF-8")
        .getLines())
      finally res.close()
    }

    /** Number of labels in the host's public suffix (host = `labels`
      * joined on '.'). The PSL algorithm: a matching exception rule
      * prevails over everything and its public suffix is the rule
      * minus the leftmost label; otherwise the LONGEST matching rule
      * wins; otherwise the implicit `*` rule (1). */
    def publicSuffixLabels(labels: Array[String]): Int =
      publicSuffixLabels(labels, rules)

    private[graft] def publicSuffixLabels(
        labels: Array[String], r: Rules): Int = {
      val n = labels.length
      var i = 0
      while (i < n) {
        // longest-first: the first matching exception is the longest
        if (r.exception.contains(join(labels, i))) return n - i - 1
        i += 1
      }
      var best = 1 // implicit default rule `*`
      i = 0
      while (i < n) {
        val len = n - i
        if (len > best && r.exact.contains(join(labels, i))) best = len
        // `*.base` matches a suffix one label longer than the base
        if (i + 1 < n && len > best &&
            r.wildcard.contains(join(labels, i + 1))) best = len
        i += 1
      }
      best
    }

    private def join(labels: Array[String], from: Int): String = {
      val b = new java.lang.StringBuilder()
      var i = from
      while (i < labels.length) {
        if (i > from) b.append('.')
        b.append(labels(i))
        i += 1
      }
      b.toString
    }
  }

  private[operators] def registeredDomainOf(host: String): String =
    registeredDomainOf(host, Psl.rules)

  private[operators] def registeredDomainOf(
      host: String, r: Psl.Rules): String = {
    if (host.isEmpty) return host
    if (host.charAt(0) == '[') return host // ipv6
    if (isIpv4(host)) return host
    val labels = host.split("\\.", -1)
    if (labels.length <= 1) return host
    val ps = Psl.publicSuffixLabels(labels, r)
    if (ps >= labels.length) host // the host IS a public suffix
    else labels.drop(labels.length - ps - 1).mkString(".")
  }

  /** The parse + canonicalization kernel. Package-visible for the
    * spec's direct-vector legs. Never throws. */
  private[operators] def parse(raw: String): InternalRow = {
    val s = raw.trim
    val row = new Array[Any](8)
    row(7) = UTF8String.fromString(s)
    val sep = s.indexOf("://")
    val schemeOk = sep > 0 && {
      val c0 = s.charAt(0)
      ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')) &&
        (1 until sep).forall(i => isSchemeChar(s.charAt(i)))
    }
    if (!schemeOk) return new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(row)
    val scheme = lowerAscii(s.substring(0, sep))
    val rest = s.substring(sep + 3)
    var authEnd = 0
    while (authEnd < rest.length && {
        val c = rest.charAt(authEnd)
        c != '/' && c != '?' && c != '#'
      }) authEnd += 1
    val authority = rest.substring(0, authEnd)
    val after = rest.substring(authEnd)
    // strip userinfo
    val at = authority.lastIndexOf('@')
    val hp = if (at >= 0) authority.substring(at + 1) else authority
    // host / port
    var host: String = null
    var port = -1
    if (hp.nonEmpty && hp.charAt(0) == '[') {
      val close = hp.indexOf(']')
      if (close < 0) host = lowerAscii(hp)
      else {
        host = lowerAscii(hp.substring(0, close + 1))
        val tail = hp.substring(close + 1)
        if (tail.length >= 2 && tail.charAt(0) == ':' &&
            tail.substring(1).forall(isAsciiDigit) && tail.length <= 6) {
          val p = tail.substring(1).toInt
          if (p <= 65535) port = p else host = lowerAscii(hp)
        } else if (tail.nonEmpty) host = lowerAscii(hp)
      }
    } else {
      val colon = hp.lastIndexOf(':')
      if (colon >= 0 && colon < hp.length - 1 && hp.length - colon <= 6 &&
          (colon + 1 until hp.length).forall(i =>
            isAsciiDigit(hp.charAt(i)))) {
        val p = hp.substring(colon + 1).toInt
        if (p <= 65535) { host = lowerAscii(hp.substring(0, colon)); port = p }
        else host = lowerAscii(hp)
      } else host = lowerAscii(hp)
    }
    // canonical host: one trailing dot drops
    if (host.nonEmpty && host.charAt(host.length - 1) == '.' &&
        host.charAt(0) != '[')
      host = host.substring(0, host.length - 1)
    // path / query / fragment
    var q = after.indexOf('?')
    var f = after.indexOf('#')
    if (f >= 0 && q > f) q = -1 // '?' inside the fragment is fragment text
    val pathEnd =
      if (q >= 0) q else if (f >= 0) f else after.length
    val rawPath = after.substring(0, pathEnd)
    val rawQuery =
      if (q >= 0) after.substring(q + 1, if (f >= 0) f else after.length)
      else null
    val fragment = if (f >= 0) after.substring(f + 1) else null
    val path = {
      val p = removeDotSegments(rawPath)
      if (p.isEmpty) "/" else p
    }
    val keptParams: Seq[String] =
      if (rawQuery == null || rawQuery.isEmpty) Nil
      else rawQuery.split("&", -1).toSeq.filter { tok =>
        tok.nonEmpty && {
          val eq = tok.indexOf('=')
          val name = lowerAscii(if (eq >= 0) tok.substring(0, eq) else tok)
          !(name.startsWith("utm_") || Tracking.contains(name))
        }
      }.sorted
    val normQuery = if (keptParams.isEmpty) null else keptParams.mkString("&")
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(host)
    if (port >= 0 && port != defaultPort(scheme))
      sb.append(':').append(port)
    sb.append(path)
    if (normQuery != null) sb.append('?').append(normQuery)
    row(0) = UTF8String.fromString(scheme)
    row(1) = UTF8String.fromString(host)
    row(2) = if (port >= 0) Int.box(port) else null
    row(3) = UTF8String.fromString(path)
    row(4) = if (normQuery == null) null else UTF8String.fromString(normQuery)
    row(5) = if (fragment == null) null else UTF8String.fromString(fragment)
    row(6) = UTF8String.fromString(registeredDomainOf(host))
    row(7) = UTF8String.fromString(sb.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }

  // --------------------------------------------------- reference resolution

  /** RFC 3986 §5.2 reference resolution for crawl-edge extraction:
    * resolves `ref` (an href as it appears in markup) against `base`
    * (the page's own URL) into an ABSOLUTE hierarchical URL, or null
    * when the reference is not a crawl edge. Deterministic, documented,
    * never throws — the DuckDB oracle recomputes it closed-form:
    *
    *  - the fragment cuts first (crawl edges ignore it; a
    *    fragment-only or empty ref is a self-reference → null);
    *  - a scheme-qualified ref (RFC scheme token then `:`) resolves on
    *    its own; non-hierarchical schemes — `mailto:`, `javascript:`,
    *    `data:`, `tel:`, anything without `//` after the colon — are
    *    not crawl edges → null. The scheme-token test is what keeps
    *    `javascript:alert('http://x')` from leaking through as a
    *    relative path;
    *  - `//host/p` takes the base scheme; `/p` the base authority;
    *    `?q` the base path; anything else merges with the base path's
    *    directory (§5.2.3) — all through remove_dot_segments, so
    *    `../up` climbs and an empty outcome renders `/`;
    *  - the SCHEME lowercases; authority and path pass through
    *    VERBATIM otherwise — resolution is not canonicalization, feed
    *    the result to [[normalize]] downstream (one kernel each, both
    *    scan-side).
    */
  private[graft] def resolveRef(base: String, ref: String): String = {
    if (ref == null) return null
    val s0 = ref.trim
    val hash = s0.indexOf('#')
    val s = if (hash >= 0) s0.substring(0, hash) else s0
    if (s.isEmpty) return null
    // scheme-qualified?
    var colon = -1
    val c0 = s.charAt(0)
    if ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')) {
      var i = 1
      var broke = false
      while (i < s.length && colon < 0 && !broke) {
        val c = s.charAt(i)
        if (c == ':') colon = i
        else if (!isSchemeChar(c)) broke = true
        i += 1
      }
    }
    if (colon > 0) {
      val scheme = lowerAscii(s.substring(0, colon))
      val rest = s.substring(colon + 1)
      if (!rest.startsWith("//")) return null // mailto:, javascript:, data:
      return assembleResolved(scheme, rest.substring(2))
    }
    // schemeless: needs a hierarchical base
    if (base == null) return null
    val b = base.trim
    val sep = b.indexOf("://")
    if (sep <= 0) return null
    val bScheme = lowerAscii(b.substring(0, sep))
    val bRest = b.substring(sep + 3)
    var aEnd = 0
    while (aEnd < bRest.length && {
        val c = bRest.charAt(aEnd); c != '/' && c != '?' && c != '#'
      }) aEnd += 1
    val bAuth = bRest.substring(0, aEnd)
    if (bAuth.isEmpty) return null
    val bAfter = bRest.substring(aEnd)
    val bq = bAfter.indexOf('?')
    val bf = bAfter.indexOf('#')
    val bPathEnd =
      if (bq >= 0 && (bf < 0 || bq < bf)) bq
      else if (bf >= 0) bf else bAfter.length
    val bPath = bAfter.substring(0, bPathEnd)
    if (s.startsWith("//")) return assembleResolved(bScheme, s.substring(2))
    if (s.charAt(0) == '?') {
      val p0 = removeDotSegments(bPath)
      val p = if (p0.isEmpty) "/" else p0
      return bScheme + "://" + bAuth + p + s
    }
    val rq = s.indexOf('?')
    val rPath = if (rq >= 0) s.substring(0, rq) else s
    val rQuery = if (rq >= 0) s.substring(rq) else ""
    val merged =
      if (rPath.startsWith("/")) rPath
      else {
        val dir = bPath.lastIndexOf('/')
        (if (dir >= 0) bPath.substring(0, dir + 1) else "/") + rPath
      }
    val cleaned0 = removeDotSegments(
      if (merged.startsWith("/")) merged else "/" + merged)
    val cleaned = if (cleaned0.isEmpty) "/" else cleaned0
    bScheme + "://" + bAuth + cleaned + rQuery
  }

  /** scheme + "://" + (authority [path [?query]]) with dot segments
    * removed and the empty path rendered `/`; fragment already cut. */
  private def assembleResolved(scheme: String, afterSlashes: String)
      : String = {
    var aEnd = 0
    while (aEnd < afterSlashes.length && {
        val c = afterSlashes.charAt(aEnd); c != '/' && c != '?'
      }) aEnd += 1
    val auth = afterSlashes.substring(0, aEnd)
    if (auth.isEmpty) return null
    val after = afterSlashes.substring(aEnd)
    val q = after.indexOf('?')
    val path0 = if (q >= 0) after.substring(0, q) else after
    val query = if (q >= 0) after.substring(q) else ""
    val p0 = removeDotSegments(path0)
    val path = if (p0.isEmpty) "/" else p0
    scheme + "://" + auth + path + query
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** The parsed struct: scheme, host, port, path, query, fragment,
    * registered_domain, normalized. */
  def parts(url: Column): Column = B.column(UrlParts(B.expression(url)))

  /** Canonical URL string (see the kernel doc for the exact rules). */
  def normalize(url: Column): Column = parts(url).getField("normalized")

  /** Lowercased host, userinfo stripped, trailing dot dropped. */
  def host(url: Column): Column = parts(url).getField("host")

  /** Full-PSL registered domain — the per-domain cap / grouping key. */
  def registeredDomain(url: Column): Column =
    parts(url).getField("registered_domain")
}
