package graft.operators

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content sniffing for the byte-honest half of web ingestion: a WARC
  * response body is BYTES with a frequently-lying Content-Type header,
  * so a corpus pipeline (a) sniffs the real media type from magic
  * bytes before routing to the HTML/image/audio kernels, and (b)
  * decodes text through the DECLARED-or-detected charset instead of
  * assuming UTF-8 (the 2000s web is windows-1252; a blind UTF-8 cast
  * turns every é into U+FFFD). Both are single-pass scan-side kernels
  * in the WarcParse discipline: bounded, deterministic, nothing
  * malformed ever throws.
  *
  *  - [[ContentSniff.mime]]: the WHATWG MIME-sniffing table over the
  *    leading bytes — image/audio/video containers by magic, html/xml
  *    by case-insensitive tag prescan, then the standard's binary-byte
  *    test deciding text/plain vs application/octet-stream.
  *  - [[ContentSniff.decodeText]]: BOM (UTF-8/16LE/16BE) first, else
  *    an ASCII prescan of the first [[ContentSniff.PrescanBytes]]
  *    bytes for a `charset=` declaration (meta tag or header-ish),
  *    else UTF-8. Labels resolve per the WHATWG encoding registry's
  *    spirit: `iso-8859-1`/`latin1`/`ascii` all decode as
  *    windows-1252 (what browsers actually do — cp1252 is a superset
  *    assigning the 0x80–0x9F range), unknown labels fall back to
  *    UTF-8, and decoding REPLACES malformed sequences, never throws. */
case class MimeSniff(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ContentSniff.sniff(v.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression)
      : MimeSniff = copy(child = newChild)
}

case class DecodeText(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(ContentSniff.decode(v.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression)
      : DecodeText = copy(child = newChild)
}

object ContentSniff {

  /** How far the charset prescan looks — the WHATWG prescan bound. */
  val PrescanBytes = 1024

  private def at(b: Array[Byte], i: Int, want: Int): Boolean =
    i < b.length && (b(i) & 0xFF) == want

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean = {
    if (i + s.length > b.length) return false
    var k = 0
    while (k < s.length) {
      if (b(i + k) != s.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  private def asciiCi(b: Array[Byte], i: Int, sUpper: String): Boolean = {
    if (i + sUpper.length > b.length) return false
    var k = 0
    while (k < sUpper.length) {
      var c = b(i + k) & 0xFF
      if (c >= 'a' && c <= 'z') c -= 32
      if (c != sUpper.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Case-insensitive HTML tag openers from the WHATWG sniffing table;
    * each must be followed by a tag-terminating byte (space or `>`). */
  private val HtmlTags = Array("<!DOCTYPE HTML", "<HTML", "<HEAD",
    "<SCRIPT", "<IFRAME", "<H1", "<DIV", "<FONT", "<TABLE", "<A",
    "<STYLE", "<TITLE", "<B", "<BODY", "<BR", "<P", "<!--")

  private[graft] def sniff(b: Array[Byte]): String = {
    if (b.length == 0) return "application/octet-stream"
    // exact-magic table first
    if (at(b, 0, 0xFF) && at(b, 1, 0xD8) && at(b, 2, 0xFF)) return "image/jpeg"
    if (at(b, 0, 0x89) && ascii(b, 1, "PNG\r\n") && at(b, 6, 0x1A) &&
      at(b, 7, 0x0A)) return "image/png"
    if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) return "image/gif"
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WEBP")) return "image/webp"
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) return "audio/wav"
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "AVI ")) return "video/avi"
    if (ascii(b, 0, "BM")) return "image/bmp"
    if (at(b, 0, 0x1A) && at(b, 1, 0x45) && at(b, 2, 0xDF) &&
      at(b, 3, 0xA3)) return "video/webm" // EBML (mkv/webm)
    if (ascii(b, 4, "ftyp")) return "video/mp4"
    if (ascii(b, 0, "%PDF-")) return "application/pdf"
    if (ascii(b, 0, "PK") && at(b, 2, 0x03) && at(b, 3, 0x04))
      return "application/zip"
    if (at(b, 0, 0x1F) && at(b, 1, 0x8B)) return "application/gzip"
    if (ascii(b, 0, "OggS")) return "application/ogg"
    if (ascii(b, 0, "fLaC")) return "audio/flac"
    if (ascii(b, 0, "ID3")) return "audio/mpeg"
    if (ascii(b, 0, "WARC/")) return "application/warc"
    if (at(b, 0, 0x00) && at(b, 1, 0x00) && at(b, 2, 0x01) &&
      at(b, 3, 0x00)) return "image/x-icon"
    // tag prescan: skip UTF-8 BOM + ASCII whitespace, then the table
    var i = if (at(b, 0, 0xEF) && at(b, 1, 0xBB) && at(b, 2, 0xBF)) 3 else 0
    while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' ||
      b(i) == '\r' || b(i) == 0x0C)) i += 1
    var t = 0
    while (t < HtmlTags.length) {
      val tag = HtmlTags(t)
      if (asciiCi(b, i, tag)) {
        val after = i + tag.length
        val term = after >= b.length || b(after) == ' ' || b(after) == '>' ||
          b(after) == '\t' || b(after) == '\n' || b(after) == '\r' ||
          tag == "<!--"
        if (term) return "text/html"
      }
      t += 1
    }
    if (asciiCi(b, i, "<?XML")) return "text/xml"
    // WHATWG binary-byte test over the first 1445 bytes
    val n = math.min(b.length, 1445)
    var k = 0
    while (k < n) {
      val c = b(k) & 0xFF
      if (c <= 0x08 || c == 0x0B || (c >= 0x0E && c <= 0x1A) ||
        (c >= 0x1C && c <= 0x1F)) return "application/octet-stream"
      k += 1
    }
    "text/plain"
  }

  /** WHATWG-registry-flavored label resolution. Bounded map; unknown
    * labels (and labels this JVM lacks) fall back to UTF-8. */
  private[graft] def charsetFor(label: String): Charset = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" | "us-ascii" | "ascii" =>
        StandardCharsets.UTF_8
      case "iso-8859-1" | "latin1" | "l1" | "windows-1252" | "cp1252" |
          "x-cp1252" | "iso8859-1" | "iso_8859-1" =>
        // browsers decode latin1 labels as cp1252 (its 0x80-0x9F are
        // the printable quotes/dashes the bare standard leaves blank)
        Charset.forName("windows-1252")
      case "utf-16" | "utf-16le" | "unicodefeff" =>
        StandardCharsets.UTF_16LE
      case "utf-16be" => StandardCharsets.UTF_16BE
      case other =>
        try Charset.forName(other)
        catch { case _: Exception => StandardCharsets.UTF_8 }
    }
  }

  /** Finds `charset=<label>` in the first [[PrescanBytes]] bytes,
    * ASCII-case-insensitively (covers `<meta charset="x">` and
    * `content="text/html; charset=x"` alike). */
  private[graft] def declaredCharset(b: Array[Byte]): Option[String] = {
    val n = math.min(b.length, PrescanBytes)
    var i = 0
    while (i + 8 <= n) {
      if (asciiCi(b, i, "CHARSET")) {
        var p = i + 7
        while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
        if (p < n && b(p) == '=') {
          p += 1
          while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
          if (p < n && (b(p) == '"' || b(p) == '\'')) p += 1
          val start = p
          while (p < n && {
            val c = b(p) & 0xFF
            (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
              (c >= '0' && c <= '9') || c == '-' || c == '_' ||
              c == ':' || c == '.' || c == '+'
          }) p += 1
          if (p > start)
            return Some(new String(b, start, p - start,
              StandardCharsets.US_ASCII))
        }
      }
      i += 1
    }
    None
  }

  private def decodeWith(b: Array[Byte], off: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, b.length - off))
      .toString
    catch { case _: Exception => // a pathological decoder state
      new String(b, off, b.length - off, StandardCharsets.UTF_8)
    }
  }

  private[graft] def decode(b: Array[Byte]): String = {
    if (b.length == 0) return ""
    // BOM wins over everything (and is consumed)
    if (at(b, 0, 0xEF) && at(b, 1, 0xBB) && at(b, 2, 0xBF))
      return decodeWith(b, 3, StandardCharsets.UTF_8)
    if (at(b, 0, 0xFF) && at(b, 1, 0xFE))
      return decodeWith(b, 2, StandardCharsets.UTF_16LE)
    if (at(b, 0, 0xFE) && at(b, 1, 0xFF))
      return decodeWith(b, 2, StandardCharsets.UTF_16BE)
    declaredCharset(b) match {
      case Some(label) => decodeWith(b, 0, charsetFor(label))
      case None => decodeWith(b, 0, StandardCharsets.UTF_8)
    }
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** Sniffed MIME type of the leading bytes ([[MimeSniff]]). */
  def mime(bytes: Column): Column =
    B.column(MimeSniff(B.expression(bytes)))

  /** Charset-honest text of an HTML/text body ([[DecodeText]]):
    * BOM → declared `charset=` → UTF-8, malformed bytes replaced. */
  def decodeText(bytes: Column): Column =
    B.column(DecodeText(B.expression(bytes)))
}
