package graft

import org.apache.spark.sql.functions._

import graft.operators.ContentSniff

/** Pins the content-sniffing kernels: the WHATWG-table MIME sniff
  * (magic bytes, html/xml tag prescan, binary-byte test) and the
  * charset-honest text decode (BOM > declared charset > UTF-8,
  * cp1252-for-latin1 browser behavior, replacement never-throw). */
class ContentSniffSpec extends SparkSpec {
  import spark.implicits._

  private def mimeOf(b: Array[Byte]): String =
    Seq(Tuple1(b)).toDF("b")
      .select(ContentSniff.mime($"b")).head().getString(0)

  private def decodeOf(b: Array[Byte]): String =
    Seq(Tuple1(b)).toDF("b")
      .select(ContentSniff.decodeText($"b")).head().getString(0)

  test("magic bytes: the container table routes to the right kernel " +
      "family") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    assert(mimeOf(bytes(0xFF, 0xD8, 0xFF, 0xE0) ++ "JFIF".getBytes)
      == "image/jpeg")
    assert(mimeOf(bytes(0x89) ++ "PNG\r\n".getBytes ++ bytes(0x1A, 0x0A))
      == "image/png")
    assert(mimeOf("GIF89a......".getBytes) == "image/gif")
    assert(mimeOf("RIFF1234WAVEfmt ".getBytes) == "audio/wav")
    assert(mimeOf("RIFF1234WEBPVP8 ".getBytes) == "image/webp")
    assert(mimeOf(bytes(0x1A, 0x45, 0xDF, 0xA3, 1, 2)) == "video/webm")
    assert(mimeOf(bytes(0, 0, 0, 0x20) ++ "ftypisom".getBytes)
      == "video/mp4")
    assert(mimeOf("%PDF-1.7 blah".getBytes) == "application/pdf")
    assert(mimeOf("PK\u0003\u0004rest".getBytes("ISO-8859-1"))
      == "application/zip")
    assert(mimeOf(bytes(0x1F, 0x8B, 8, 0)) == "application/gzip")
    assert(mimeOf("WARC/1.0\r\n".getBytes) == "application/warc")
    assert(mimeOf("OggSxxxx".getBytes) == "application/ogg")
    assert(mimeOf("ID3\u0003rest".getBytes("ISO-8859-1")) == "audio/mpeg")
  }

  test("tag prescan and the binary-byte test: html/xml vs text vs " +
      "octet-stream") {
    assert(mimeOf("  \n<!doctype html><html>".getBytes) == "text/html")
    assert(mimeOf("<HTML><body>".getBytes) == "text/html")
    assert(mimeOf("\t<p>short page".getBytes) == "text/html")
    assert(mimeOf("<!-- comment first -->".getBytes) == "text/html")
    // UTF-8 BOM then a tag still sniffs html
    assert(mimeOf(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "<html>".getBytes) == "text/html")
    assert(mimeOf("<?xml version=\"1.0\"?><r/>".getBytes) == "text/xml")
    // '<Pseudo' is not a terminated <P tag: falls through to text
    assert(mimeOf("<Pseudo>".getBytes) == "text/plain")
    assert(mimeOf("just words, no markup".getBytes) == "text/plain")
    assert(mimeOf("Hello\u0000world".getBytes("ISO-8859-1"))
      == "application/octet-stream")
    assert(mimeOf(Array.empty[Byte]) == "application/octet-stream")
  }

  test("decode: BOMs win and are consumed; declared charset=cp1252 " +
      "recovers the 0x80-0x9F range; latin1 labels decode as cp1252") {
    // UTF-8 BOM
    assert(decodeOf(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "café".getBytes("UTF-8")) == "café")
    // UTF-16LE BOM
    assert(decodeOf(Array(0xFF.toByte, 0xFE.toByte) ++
      "héllo".getBytes("UTF-16LE")) == "héllo")
    // UTF-16BE BOM
    assert(decodeOf(Array(0xFE.toByte, 0xFF.toByte) ++
      "héllo".getBytes("UTF-16BE")) == "héllo")
    // declared windows-1252: 0xE9 = é, 0x80 = € (UTF-8 would replace)
    val cp = "<meta charset=\"windows-1252\"><p>caf".getBytes ++
      Array(0xE9.toByte, ' '.toByte, 0x80.toByte)
    assert(decodeOf(cp).endsWith("café €"))
    // latin1 label, browser behavior: 0x93/0x94 are cp1252 quotes
    val l1 = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=iso-8859-1\">q").getBytes ++
      Array(0x93.toByte, 'x'.toByte, 0x94.toByte)
    assert(decodeOf(l1).endsWith("q“x”"))
    // no declaration: UTF-8, and malformed bytes REPLACE, never throw
    assert(decodeOf("ok ".getBytes ++ Array(0xE9.toByte)) == "ok �")
    // unknown label falls back to UTF-8
    assert(decodeOf("<meta charset=zorkmid-9>ab".getBytes)
      .endsWith(">ab"))
    assert(decodeOf(Array.empty[Byte]) == "")
  }

  test("the WARC story becomes byte-honest: sniff the body, decode " +
      "through the declared charset, then extract") {
    import graft.operators.{HtmlExtract, WarcParse}
    val html = ("<html><head><meta charset=windows-1252></head>" +
      "<body><p>résumé café</p></body></html>")
      .getBytes("windows-1252")
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\nContent-Type: " +
      s"text/html\r\nContent-Length: ${html.length}\r\n\r\n")
      .getBytes("UTF-8") ++ html ++ "\r\n\r\n".getBytes
    val got = Seq(Tuple1(rec)).toDF("w")
      .select(explode(WarcParse.records($"w")).as("r"), $"w")
      .select(WarcParse.body($"w", $"r").as("body"))
      .select(ContentSniff.mime($"body").as("mime"),
        HtmlExtract.text(ContentSniff.decodeText($"body")).as("text"))
      .head()
    assert(got.getString(0) == "text/html")
    assert(got.getString(1) == "résumé café")
  }
}
