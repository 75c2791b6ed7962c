package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sitemap parsing (sitemaps.org protocol) — the crawl-frontier
  * complement to [[RobotsTxt]] (which already collects the `Sitemap:`
  * pointers): a sitemap enumerates a site's canonical URLs with
  * freshness metadata, which a corpus pipeline uses to seed fetches
  * and to prefer canonical URLs during dedup. One-pass tag scan in the
  * ContainerParse discipline — no XML library, no DOM, malformed
  * markup never throws; entries parsed before any damage survive.
  *
  * Handles both document kinds: `<urlset>` (leaf sitemaps: `<url>`
  * entries with loc/lastmod/changefreq/priority) and `<sitemapindex>`
  * (index files: `<sitemap>` entries pointing at child sitemaps —
  * `kind` distinguishes them so the frontier knows to recurse).
  * Minimal XML lexing: tags match case-insensitively, values take the
  * text to the next `<`, the five standard XML entities decode, CDATA
  * wrappers strip, and entries cap at [[Sitemap.MaxEntries]] — the
  * protocol's own 50,000-URL-per-file limit doubling as the hostile
  * bound. */
case class SitemapEntries(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = Sitemap.Schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    Sitemap.parse(v.toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SitemapEntries = copy(child = newChild)
}

object Sitemap {

  val EntrySchema: StructType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true),
    StructField("kind", StringType, nullable = false))) // url | sitemap

  val Schema: DataType = ArrayType(EntrySchema, containsNull = false)

  /** The protocol's own per-file limit (sitemaps.org: 50,000 URLs) —
    * also the hostile-input bound. */
  val MaxEntries = 50000

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
  }

  /** Case-insensitive index of `<tag` at/after `from`; -1 when absent. */
  private def findTag(s: String, tag: String, from: Int): Int = {
    val needle = "<" + tag
    var i = from
    val limit = s.length - needle.length
    while (i <= limit) {
      var k = 0
      var ok = true
      while (ok && k < needle.length) {
        var c = s.charAt(i + k)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c != needle.charAt(k)) ok = false
        k += 1
      }
      if (ok) {
        // tag name must terminate ('>' or whitespace) — <urls is not <url
        val after = i + needle.length
        if (after >= s.length || s.charAt(after) == '>' ||
            s.charAt(after) == ' ' || s.charAt(after) == '\t' ||
            s.charAt(after) == '\n' || s.charAt(after) == '\r' ||
            s.charAt(after) == '/')
          return i
      }
      i += 1
    }
    -1
  }

  /** Text content of the FIRST `<tag>…</tag>` inside s[from, until). */
  private def tagText(
      s: String, tag: String, from: Int, until: Int): String = {
    val open = findTag(s, tag, from)
    if (open < 0 || open >= until) return null
    val gt = s.indexOf('>', open)
    if (gt < 0 || gt >= until) return null
    // a CDATA wrapper starts with '<' — recognize it BEFORE the
    // text-to-next-'<' rule would cut the value to empty
    var w = gt + 1
    while (w < until && (s.charAt(w) == ' ' || s.charAt(w) == '\t' ||
      s.charAt(w) == '\n' || s.charAt(w) == '\r')) w += 1
    val raw =
      if (s.startsWith("<![CDATA[", w)) {
        val endCd = s.indexOf("]]>", w + 9)
        val end = if (endCd < 0 || endCd > until) until else endCd
        s.substring(w + 9, end)
      } else {
        val close = s.indexOf('<', gt + 1)
        val end = if (close < 0 || close > until) until else close
        s.substring(gt + 1, end)
      }
    val v = decodeEntities(raw.trim)
    if (v.isEmpty) null else v
  }

  private[graft] def parse(content: String): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    // one entry tag kind per document kind; detect by which appears
    def scan(entryTag: String, kind: String): Unit = {
      var i = findTag(content, entryTag, 0)
      while (i >= 0 && out.size < MaxEntries) {
        val next = findTag(content, entryTag, i + 1)
        val until = if (next < 0) content.length else next
        val loc = tagText(content, "loc", i, until)
        if (loc != null) {
          val lastmod = tagText(content, "lastmod", i, until)
          val freq = tagText(content, "changefreq", i, until)
          val prioRaw = tagText(content, "priority", i, until)
          val prio: Any =
            if (prioRaw == null) null
            else try java.lang.Double.valueOf(prioRaw.trim.toDouble)
            catch { case _: NumberFormatException => null }
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(loc.trim),
            if (lastmod == null) null
            else UTF8String.fromString(lastmod.trim),
            if (freq == null) null else UTF8String.fromString(freq.trim),
            prio,
            UTF8String.fromString(kind)))
        }
        i = next
      }
    }
    if (findTag(content, "sitemapindex", 0) >= 0) scan("sitemap", "sitemap")
    else scan("url", "url")
    new GenericArrayData(out.toArray)
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** The entries column ([[SitemapEntries]]): loc/lastmod/changefreq/
    * priority/kind over leaf sitemaps and index files alike. */
  def entries(xml: Column): Column =
    B.column(SitemapEntries(B.expression(xml)))
}
