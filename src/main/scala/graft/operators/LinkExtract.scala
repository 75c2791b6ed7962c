package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Outlink extraction — the edge emitter between [[HtmlExtract]] (page
  * text) and the frontier/politeness layer ([[Sitemap]], [[RobotsTxt]]):
  * `<a href>` targets resolved against the page's own URL
  * ([[UrlOps.resolveRef]], RFC 3986 §5.2), with anchor text and the
  * `rel=nofollow` politeness bit. The host-level link graph
  * ([[LinkGraph]]) and any crawl frontier are one `explode` away.
  *
  * One pass in the [[HtmlExtract]] kernel discipline (no DOM, no
  * external parser, malformed markup never throws — links before the
  * damage survive): comments/script/style skip wholesale so a
  * commented-out or generated `<a` is not an edge; attribute scanning
  * is quote-aware (`href="a>b"` does not end the tag); entities decode
  * in BOTH href values (`&amp;` in query strings is ubiquitous) and
  * anchor text; `<a>` cannot nest per the HTML spec, so a new `<a`
  * emits the open link first, and a block-level tag or `</a` closes it
  * (anchor text = the visible text in between, tags stripped,
  * whitespace collapsed — the [[HtmlExtract]] rules).
  *
  * Per link: href entity-decodes, resolves against `base`, and links
  * that are NOT crawl edges drop — fragment-only, empty, `mailto:` /
  * `javascript:` / `data:` and every other non-hierarchical scheme
  * (see [[UrlOps.resolveRef]]). The resolved URL is NOT canonicalized —
  * compose [[UrlOps.normalize]] downstream, one kernel each.
  *
  * At 100 TB: narrow scan-side projection, zero shuffle; the natural
  * consumers (`explode` → per-host caps → groupBy registered domain)
  * shuffle slim (url, anchor) rows, never the page bytes. Output
  * `array<struct<url string, anchor string, nofollow boolean>>`.
  */
case class HtmlLinks(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LinkExtract.Schema
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val h = left.eval(input)
    if (h == null) return new GenericArrayData(Array.empty[Any])
    val b = right.eval(input)
    LinkExtract.extract(
      h.asInstanceOf[UTF8String].toString,
      if (b == null) null else b.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlLinks =
    copy(left = newLeft, right = newRight)
}

object LinkExtract {

  val LinkSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  val Schema: DataType = ArrayType(LinkSchema, containsNull = false)

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Entity-decode a raw attribute value (href as written in markup). */
  private[operators] def decodeEntities(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(s, 0, i)
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val e = HtmlExtract.entityAt(s, i)
        if (e >= 0) {
          sb.appendCodePoint((e & 0xFFFFFFFFL).toInt)
          i = (e >>> 32).toInt
        } else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The one-pass link kernel. Package-visible for spec vectors. */
  private[operators] def extract(s: String, base: String)
      : GenericArrayData = {
    val n = s.length
    val links = scala.collection.mutable.ArrayBuffer.empty[Any]
    val anchor = new java.lang.StringBuilder(32)
    var inA = false
    var href: String = null
    var rel: String = null
    var pendingSpace = false

    def appendChar(c: Char): Unit = {
      if (isWs(c)) { if (anchor.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { anchor.append(' '); pendingSpace = false }
        anchor.append(c)
      }
    }

    def emit(): Unit = {
      if (inA) {
        val resolved =
          if (href == null || href.isEmpty) null
          else UrlOps.resolveRef(base, decodeEntities(href))
        if (resolved != null) {
          val nofollow = rel != null &&
            rel.toLowerCase.split("[ \\t\\n\\r\\f]+").contains("nofollow")
          links += new GenericInternalRow(Array[Any](
            UTF8String.fromString(resolved),
            UTF8String.fromString(anchor.toString),
            java.lang.Boolean.valueOf(nofollow)))
        }
      }
      inA = false; href = null; rel = null
      anchor.setLength(0); pendingSpace = false
    }

    def matchesAt(i: Int, lower: String): Boolean = {
      if (i + lower.length > n) return false
      var k = 0
      while (k < lower.length) {
        if (Character.toLowerCase(s.charAt(i + k)) != lower.charAt(k))
          return false
        k += 1
      }
      true
    }

    def indexOfCi(from: Int, lower: String): Int = {
      var i = from
      while (i <= n - lower.length) {
        if (matchesAt(i, lower)) return i
        i += 1
      }
      -1
    }

    def tagBoundary(j: Int): Boolean =
      j >= n || isWs(s.charAt(j)) || s.charAt(j) == '>' ||
        s.charAt(j) == '/'

    def indexOfCloseCi(from: Int, lower: String): Int = {
      var i = from
      while (i >= 0) {
        val k = indexOfCi(i, lower)
        if (k < 0) return -1
        if (tagBoundary(k + lower.length)) return k
        i = k + 1
      }
      -1
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (matchesAt(i, "<script") && tagBoundary(i + 7)) {
          val close = indexOfCloseCi(i + 7, "</script")
          i = if (close < 0) n
          else { val gt = s.indexOf('>', close); if (gt < 0) n else gt + 1 }
        } else if (matchesAt(i, "<style") && tagBoundary(i + 6)) {
          val close = indexOfCloseCi(i + 6, "</style")
          i = if (close < 0) n
          else { val gt = s.indexOf('>', close); if (gt < 0) n else gt + 1 }
        } else if (matchesAt(i, "<!--")) {
          val close = s.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n &&
            (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val gt = s.indexOf('>', i + 1)
          i = if (gt < 0) n else gt + 1
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter ||
            (s.charAt(i + 1) == '/' && i + 2 < n &&
              s.charAt(i + 2).isLetter))) {
          val closing = s.charAt(i + 1) == '/'
          var p = i + (if (closing) 2 else 1)
          val nameStart = p
          while (p < n && s.charAt(p).isLetterOrDigit) p += 1
          val name = s.substring(nameStart, p).toLowerCase
          // attribute scan: quote-aware; captures href/rel on <a ...>
          var capHref: String = null
          var capRel: String = null
          if (!closing && name == "a") {
            while (p < n && isWs(s.charAt(p))) p += 1
            while (p < n && s.charAt(p) != '>' && s.charAt(p) != '/') {
              val aStart = p
              while (p < n && {
                  val ch = s.charAt(p)
                  !isWs(ch) && ch != '=' && ch != '>' && ch != '/'
                }) p += 1
              val attr = s.substring(aStart, p).toLowerCase
              while (p < n && isWs(s.charAt(p))) p += 1
              var value: String = null
              if (p < n && s.charAt(p) == '=') {
                p += 1
                while (p < n && isWs(s.charAt(p))) p += 1
                if (p < n && (s.charAt(p) == '"' || s.charAt(p) == '\'')) {
                  val q = s.charAt(p)
                  val end = s.indexOf(q, p + 1)
                  if (end < 0) { value = s.substring(p + 1); p = n }
                  else { value = s.substring(p + 1, end); p = end + 1 }
                } else {
                  val vStart = p
                  while (p < n && !isWs(s.charAt(p)) && s.charAt(p) != '>')
                    p += 1
                  value = s.substring(vStart, p)
                }
              }
              if (attr == "href") capHref = value
              else if (attr == "rel") capRel = value
              while (p < n && isWs(s.charAt(p))) p += 1
              // a bare '/' (self-close or junk) that is not '/>': skip it
              if (p < n && s.charAt(p) == '/' && p + 1 < n &&
                  s.charAt(p + 1) != '>') p += 1
            }
          }
          // skip to the tag's own '>', honoring quoted values
          var q = '\u0000'
          while (p < n && (q != '\u0000' || s.charAt(p) != '>')) {
            val ch = s.charAt(p)
            if (q == '\u0000' && (ch == '"' || ch == '\'')) q = ch
            else if (ch == q) q = '\u0000'
            p += 1
          }
          i = if (p < n) p + 1 else n
          if (name == "a") {
            if (closing) emit()
            else { // <a> cannot nest: an open link emits first
              emit()
              inA = true; href = capHref; rel = capRel
            }
          } else if (HtmlExtract.BlockTags.contains(name)) {
            emit() // block boundary closes a dangling <a>
          }
          // other inline tags (<b>, <span>, <img>) strip silently
        } else {
          appendChar('<')
          i += 1
        }
      } else if (c == '&') {
        val e = HtmlExtract.entityAt(s, i)
        if (e >= 0) {
          Character.toChars((e & 0xFFFFFFFFL).toInt).foreach(appendChar)
          i = (e >>> 32).toInt
        } else { appendChar('&'); i += 1 }
      } else {
        appendChar(c)
        i += 1
      }
    }
    emit() // unterminated <a>: keep what resolved
    new GenericArrayData(links.toArray)
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** Resolved outlinks: `array<struct<url, anchor, nofollow>>`. */
  def links(html: Column, base: Column): Column =
    B.column(HtmlLinks(B.expression(html), B.expression(base)))

  /** Scalar RFC 3986 reference resolution (sitemap locs, redirects):
    * null when `ref` is not a crawl edge — see [[UrlOps.resolveRef]]. */
  def resolve(base: Column, ref: Column): Column =
    B.column(UrlResolve(B.expression(base), B.expression(ref)))
}

/** Scalar face of [[UrlOps.resolveRef]]. */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val r = right.eval(input)
    if (r == null) return null
    val b = left.eval(input)
    val out = UrlOps.resolveRef(
      if (b == null) null else b.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}
