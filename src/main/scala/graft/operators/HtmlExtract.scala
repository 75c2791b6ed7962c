package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → block text extraction in ONE walk over the markup — the
  * web-corpus ingestion staple (C4 / RefinedWeb / FineWeb pipelines all
  * start from HTML, and before r14 a user had to pre-extract outside
  * the engine before [[Curate]] could touch the data). Built in the
  * [[TextStats]]/[[RepetitionStats]] one-pass-kernel style: no external
  * parser library, no DOM, no allocation beyond the output blocks —
  * a bounded state machine that never throws on malformed markup
  * (truncated tags, stray `<`, unterminated scripts, bad entities all
  * degrade to deterministic text, because a 100 TB crawl contains
  * every way HTML can be broken).
  *
  * Per BLOCK the kernel also reports total and LINK character counts,
  * so link density — the classic boilerplate signal (nav bars, footer
  * link farms have density ~1.0; body prose ~0.0; the
  * jusText/boilerpipe discipline) — is a free per-block column a
  * curation filter applies without re-walking anything.
  *
  * Semantics (deterministic, spec-pinned in HtmlExtractSpec):
  *  - `<script>`/`<style>` (case-insensitive) skip to their matching
  *    close tag — content is never text, even when it contains `<`;
  *    unterminated → skipped to end of input;
  *  - `<!-- -->` comments, `<!DOCTYPE>`, and `<? ?>` directives skip;
  *  - BLOCK tags (p, div, h1-h6, li, ul, ol, table, tr, td, th, br,
  *    hr, title, blockquote, pre, section, article, header, footer,
  *    nav, aside, form, figure, figcaption, main, dl, dt, dd) — open
  *    OR close — terminate the current block; every other tag
  *    (a, b, i, span, em, ...) is inline and drops silently;
  *  - `<a ...>`...`</a>` text counts into the block's `link_chars`;
  *  - entities decode: the five XML named forms + `&nbsp;` (→ space)
  *    + `&#NN;`/`&#xHH;` numeric; an unterminated or unknown `&...`
  *    passes through verbatim;
  *  - whitespace (ASCII ` \t\n\f\r` — the RE2 `\s` set the
  *    DuckDB oracle mirrors; vertical tab is deliberately excluded) collapses to single spaces inside a
  *    block; blocks trim; whitespace-only blocks are not emitted;
  *  - a `<` not opening a tag (`<3`, `< x`) is literal text.
  *
  * At 100 TB: narrow-per-row work with zero shuffle — the extraction
  * column composes into any scan-side projection, Catalyst pushes the
  * html column read down to parquet, and the blocks array feeds
  * higher-order `filter`/`transform` (codegen'd) for boilerplate
  * gating without a second kernel pass. */
case class HtmlExtract(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = HtmlExtract.Schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    HtmlExtract.extract(v.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HtmlExtract = copy(child = newChild)
}

object HtmlExtract {

  val BlockSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("link_chars", LongType, nullable = false)))

  val Schema: DataType = ArrayType(BlockSchema, containsNull = false)

  /** Block-level elements whose open OR close tag ends the current
    * text block. Lowercase; lookups lowercase the parsed name. */
  private[operators] val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "thead", "tbody", "tr", "td", "th", "br", "hr", "title",
    "blockquote", "pre", "section", "article", "header", "footer",
    "nav", "aside", "form", "figure", "figcaption", "main", "dl",
    "dt", "dd", "body", "html", "head")

  private[operators] val Named = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"',
    "apos" -> '\'', "nbsp" -> ' ')

  /** Bounded entity scan shared with the link kernel: when `s(i)=='&'`
    * starts a well-formed entity (name or number, `;` within 12 chars),
    * returns the code point in the low 32 bits and the index AFTER the
    * `;` in the high 32; −1 when the `&` is literal text. */
  private[operators] def entityAt(s: String, i: Int): Long = {
    val n = s.length
    var p = i + 1
    val limit = math.min(n, i + 12)
    while (p < limit && s.charAt(p) != ';' && s.charAt(p) != '&' &&
        !isWs(s.charAt(p)) && s.charAt(p) != '<') p += 1
    if (p < limit && p > i + 1 && s.charAt(p) == ';') {
      val body = s.substring(i + 1, p)
      val decoded: Int =
        if (body.charAt(0) == '#') {
          val num = body.substring(1)
          try {
            if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
              Integer.parseInt(num.substring(1), 16)
            else Integer.parseInt(num)
          } catch { case _: NumberFormatException => -1 }
        } else Named.get(body.toLowerCase).map(_.toInt).getOrElse(-1)
      if (decoded >= 0 && decoded <= Character.MAX_CODE_POINT &&
          Character.isValidCodePoint(decoded))
        ((p + 1).toLong << 32) | decoded.toLong
      else -1L
    } else -1L
  }

  // deliberately NOT vertical tab (\u000B): RE2's \s (the DuckDB
  // oracle side) excludes it while Java's \s includes it -- the
  // kernel sides with the oracle so cross-engine hashes can never
  // diverge on a \x0B in crawled text
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** The one-pass state machine. Package-visible for the spec's
    * direct-vector legs. */
  private[operators] def extract(s: String): GenericArrayData = {
    val n = s.length
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder(64)
    var blockChars = 0L
    var linkChars = 0L
    var linkDepth = 0
    var pendingSpace = false

    def emitBlock(): Unit = {
      if (sb.length > 0) {
        blocks += new GenericInternalRow(Array[Any](
          UTF8String.fromString(sb.toString),
          blockChars, linkChars))
      }
      sb.setLength(0); blockChars = 0L; linkChars = 0L
      pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); blockChars += 1
          if (linkDepth > 0) linkChars += 1
          pendingSpace = false }
        sb.append(c); blockChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    // case-insensitive region match without allocating a lowercase copy
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

    // a tag NAME ends here: whitespace, '>', '/' or end of input —
    // without this, `<style-guide>` would match the `<style` prefix
    // and swallow content to the next `</style`, and a custom element
    // with no such close tag would swallow the rest of the document
    def tagBoundary(j: Int): Boolean =
      j >= n || isWs(s.charAt(j)) || s.charAt(j) == '>' ||
        s.charAt(j) == '/'

    // the next `</script`/`</style` whose name actually ENDS there
    // (`</script-card>` must not close a real `<script>`)
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
          emitBlock()
          i = if (close < 0) n
          else { val gt = s.indexOf('>', close); if (gt < 0) n else gt + 1 }
        } else if (matchesAt(i, "<style") && tagBoundary(i + 6)) {
          val close = indexOfCloseCi(i + 6, "</style")
          emitBlock()
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
            (s.charAt(i + 1) == '/' && i + 2 < n && s.charAt(i + 2).isLetter))) {
          val closing = s.charAt(i + 1) == '/'
          var p = i + (if (closing) 2 else 1)
          val nameStart = p
          while (p < n && (s.charAt(p).isLetterOrDigit)) p += 1
          val name = s.substring(nameStart, p).toLowerCase
          // attributes: skip to the tag's own '>', honoring quoted
          // values (a href="a>b" must not end the tag early)
          var q = '\u0000'
          while (p < n && (q != '\u0000' || s.charAt(p) != '>')) {
            val ch = s.charAt(p)
            if (q == '\u0000' && (ch == '"' || ch == '\'')) q = ch
            else if (ch == q) q = '\u0000'
            p += 1
          }
          i = if (p < n) p + 1 else n // unterminated tag: rest is markup
          if (BlockTags.contains(name)) {
            emitBlock()
            linkDepth = 0 // a block boundary closes any dangling <a>
          } else if (name == "a") {
            if (closing) { if (linkDepth > 0) linkDepth -= 1 }
            else linkDepth += 1
          }
        } else {
          appendChar('<') // literal: "<3", "< x", trailing "<"
          i += 1
        }
      } else if (c == '&') {
        val e = entityAt(s, i) // bounded entity scan (shared helper)
        if (e >= 0) {
          Character.toChars((e & 0xFFFFFFFFL).toInt).foreach(appendChar)
          i = (e >>> 32).toInt
        } else { appendChar('&'); i += 1 } // unknown/unterminated: literal
      } else {
        appendChar(c)
        i += 1
      }
    }
    emitBlock()
    new GenericArrayData(blocks.toArray)
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** The blocks column: `array<struct<text, chars, link_chars>>`. */
  def blocks(html: Column): Column = B.column(HtmlExtract(B.expression(html)))

  /** All block text joined with newlines — the plain tag-strip view. */
  def text(html: Column): Column =
    array_join(transform(blocks(html), b => b.getField("text")), "\n")

  /** Boilerplate-filtered main text: keeps blocks whose link density
    * (`link_chars / chars`) stays at or below `maxLinkDensity` AND that
    * carry at least `minBlockChars` characters — the jusText-style
    * gate dropping nav bars, footers, and link farms. Composed from
    * codegen'd higher-order functions over ONE kernel pass. */
  def mainText(html: Column, maxLinkDensity: Double = 0.5,
      minBlockChars: Int = 1): Column =
    array_join(
      transform(
        filter(blocks(html), b =>
          b.getField("chars") >= lit(minBlockChars.toLong) &&
            b.getField("link_chars").cast("double") <=
              lit(maxLinkDensity) * b.getField("chars").cast("double")),
        b => b.getField("text")),
      "\n")

  /** The `<meta name="robots">` directive string, lowercased ("" when
    * absent) — the crawl-politeness fact every web pipeline gates on
    * BEFORE content processing. Both attribute orders parse
    * (`name=… content=…` and `content=… name=…`), matching is
    * case-insensitive, quoting optional on the name. Pure codegen'd
    * regexp projections — no kernel pass, NULL html reads as absent. */
  def metaRobots(html: Column): Column = {
    val h = coalesce(html, lit(""))
    // quoted and UNQUOTED content values both parse
    // (`content=noindex` is legal HTML and common in the wild — a
    // quote-requiring pattern would silently admit opted-out pages)
    val nameQ = regexp_extract(h,
      "(?is)<meta\\s[^>]*?name\\s*=\\s*[\"']?robots[\"']?[^>]*?" +
        "content\\s*=\\s*[\"']([^\"'>]*)", 1)
    val nameU = regexp_extract(h,
      "(?is)<meta\\s[^>]*?name\\s*=\\s*[\"']?robots[\"']?[^>]*?" +
        "content\\s*=\\s*([^\\s\"'>][^\\s>]*)", 1)
    val contQ = regexp_extract(h,
      "(?is)<meta\\s[^>]*?content\\s*=\\s*[\"']([^\"'>]*)[\"']" +
        "[^>]*?name\\s*=\\s*[\"']?robots[\"']?", 1)
    val contU = regexp_extract(h,
      "(?is)<meta\\s[^>]*?content\\s*=\\s*([^\\s\"'>][^\\s>]*)" +
        "[^>]*?name\\s*=\\s*[\"']?robots[\"']?", 1)
    lower(when(length(nameQ) > 0, nameQ)
      .when(length(nameU) > 0, nameU)
      .when(length(contQ) > 0, contQ)
      .otherwise(contU))
  }

  /** TRUE when the robots directive carries `noindex` or `none`
    * (token-boundary match — `noindexing` does not count): the page
    * must not enter the corpus. Compose ahead of [[mainText]] in any
    * ingestion pipeline (WARC → noindex gate → extract → curate). */
  def noindex(html: Column): Column = {
    val d = metaRobots(html)
    d.rlike("(^|[,\\s])noindex([,\\s]|$)") ||
      d.rlike("(^|[,\\s])none([,\\s]|$)")
  }
}
