package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) record parsing — the container every
  * web-scale corpus arrives in (Common Crawl ships WARC; C4/RefinedWeb/
  * FineWeb all start there), and the front half of the r14 ingestion
  * story: WARC → [[HtmlExtract]] → [[Curate]]. Pure-JVM one-pass
  * parse in the [[ContainerParse]] discipline: no external library,
  * byte ranges not copies, and NOTHING malformed ever throws — a 100 TB
  * crawl contains every way a record can be truncated, mis-lengthed or
  * spliced, and one bad row must not kill the job (records parsed
  * before the damage are returned; the rest of the row's bytes are
  * skipped).
  *
  * Faces:
  *  - [[WarcParse.inflate]]: whole-file gzip → plain bytes (JDK
  *    streams handle the concatenated-member layout warc.gz uses;
  *    plain input passes through; inflation is BOUNDED at
  *    [[WarcParse.MaxInflate]] so a gzip bomb degrades to a truncated
  *    parse, not an OOM).
  *  - [[WarcParse.members]] (r15): the per-record gzip member index —
  *    (offset, clen, ulen) byte ranges in the COMPRESSED file, the
  *    Common Crawl layout where every record is its own gzip member.
  *    [[WarcParse.member]] inflates ONE member bounded at
  *    [[WarcParse.MaxInflate]] each, so the whole-file cap becomes a
  *    per-record cap and records are randomly accessible without
  *    inflating their neighbors (what the crawl's cdx indexes point
  *    at). [[WarcParse.gzip]] is the deterministic write face.
  *  - [[WarcParse.records]]: `array<struct<warc_type, target_uri,
  *    record_id, content_type, offset, length>>` over the inflated
  *    stream — offset/length are the BODY's byte range, so the body
  *    column is one `substr` over [[inflate]]'s bytes (a projection,
  *    not a re-parse).
  *
  * Parse semantics (spec-pinned in WarcParseSpec):
  *  - a record starts at `WARC/` and carries `Name: value` header
  *    lines to the first empty line (CRLF per spec; bare LF
  *    tolerated — real crawls contain both);
  *  - `Content-Length` (case-insensitive, required by the spec)
  *    bounds the body; a missing/garbled length ends the parse at
  *    that record (returning the ones before it);
  *  - a declared length running past the input clamps to the
  *    available bytes (truncated downloads stay usable);
  *  - after the body, any CRLF/LF run is consumed and the next
  *    record must again start `WARC/` — junk between records is
  *    skipped by scanning to the next `WARC/` magic. */
case class WarcRecords(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = WarcParse.Schema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    WarcParse.parse(WarcParse.inflateBytes(v.asInstanceOf[Array[Byte]]))
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WarcRecords = copy(child = newChild)
}

/** [[WarcRecords]]' sibling: whole-file gunzip as a column (identity on
  * plain bytes), so body extraction composes as
  * `WarcParse.inflate(c).substr(offset + 1, length)`. */
case class WarcInflate(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else WarcParse.inflateBytes(v.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WarcInflate = copy(child = newChild)
}

/** Gzip member index over record-gzipped WARC bytes (the Common Crawl
  * layout: every WARC record is its own gzip member, concatenated) —
  * `array<struct<offset, clen, ulen>>` of byte ranges in the
  * COMPRESSED input. Each member then inflates INDEPENDENTLY via
  * [[WarcParse.member]], so the 256 MB whole-file bound becomes a
  * PER-RECORD bound and any single record is randomly accessible
  * without touching its neighbors — the property the crawl's cdx
  * indexes exist to exploit. */
case class WarcMembers(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = WarcParse.MembersSchema
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array.empty[Any])
    WarcParse.scanMembers(v.asInstanceOf[Array[Byte]])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WarcMembers = copy(child = newChild)
}

/** Deterministic gzip of a binary column (one member; the JDK header is
  * byte-stable — zero MTIME/XFL/OS — so gzipped plants hash
  * reproducibly). The write-side face of the record-gzip layout:
  * `concat(gzip(rec1), gzip(rec2), …)` IS a valid warc.gz. */
case class WarcGzip(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WarcGzip = copy(child = newChild)
}

object WarcParse {

  val RecordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false)))

  val Schema: DataType = ArrayType(RecordSchema, containsNull = false)

  val MemberSchema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("clen", LongType, nullable = false),
    StructField("ulen", LongType, nullable = false)))

  val MembersSchema: DataType =
    ArrayType(MemberSchema, containsNull = false)

  /** Inflation bound: a hostile gzip ratio degrades to a truncated
    * parse of the first 256 MB, never an executor OOM. Real WARC
    * files are cut at ~1 GB compressed with ~4-5x ratios PER
    * RECORD — row-sized inputs here sit far under the cap. */
  val MaxInflate: Int = 256 << 20

  /** Whole-stream gunzip (concatenated members included — the warc.gz
    * layout) when the magic matches; identity otherwise. Bounded at
    * [[MaxInflate]]; a broken stream yields what inflated before the
    * damage. */
  private[operators] def inflateBytes(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
        (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B)
      return bytes
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4L, 1L << 20).toInt)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](64 << 10)
      var n = in.read(buf)
      while (n >= 0 && out.size() < MaxInflate) {
        out.write(buf, 0, math.min(n, MaxInflate - out.size()))
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => /* keep what inflated */ }
    out.toByteArray
  }

  /** End offset (exclusive) of the gzip HEADER starting at `i`, or -1
    * when malformed/truncated: fixed 10 bytes, then FEXTRA / FNAME /
    * FCOMMENT / FHCRC per FLG. Reserved FLG bits must be zero — the
    * cheap filter that rejects magic-shaped bytes inside compressed
    * payloads during re-anchor scans. */
  private def gzipHeaderEnd(b: Array[Byte], i: Int): Int = {
    if (i + 10 > b.length) return -1
    val flg = b(i + 3) & 0xFF
    if ((flg & 0xE0) != 0) return -1 // reserved bits
    var p = i + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > b.length) return -1
      val xlen = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      p += 2 + xlen
      if (p > b.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME (zero-terminated)
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT (zero-terminated)
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      p += 2
      if (p > b.length) return -1
    }
    p
  }

  /** One pass over record-gzipped bytes → the member index
    * ([[MembersSchema]]). Each candidate member (gzip magic + CM=8 +
    * valid header) is DELIMITED by inflating its deflate stream into a
    * scratch buffer (output discarded — memory stays at the 64 KB
    * scratch regardless of member size); `capPerMember` bounds the
    * inflated size, so a gzip bomb abandons THAT member and the scan
    * re-anchors on the next magic (members before and after the damage
    * survive — the same degradation contract as [[parse]]). A
    * truncated final member is dropped; a complete deflate stream with
    * a clipped 8-byte trailer is kept (its data is intact). */
  private[graft] def scanMembers(
      b: Array[Byte],
      capPerMember: Long = MaxInflate.toLong): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val scratch = new Array[Byte](64 << 10)
    var i = 0
    while (i + 3 <= b.length) {
      if ((b(i) & 0xFF) == 0x1F && (b(i + 1) & 0xFF) == 0x8B &&
          (b(i + 2) & 0xFF) == 8) {
        val hdrEnd = gzipHeaderEnd(b, i)
        var advanced = false
        if (hdrEnd >= 0 && hdrEnd < b.length) {
          val inf = new java.util.zip.Inflater(true)
          var total = 0L
          var finished = false
          var broken = false
          var consumed = 0L
          try {
            inf.setInput(b, hdrEnd, b.length - hdrEnd)
            while (!finished && !broken) {
              val n =
                try inf.inflate(scratch)
                catch {
                  case _: java.util.zip.DataFormatException =>
                    broken = true; 0
                }
              total += n
              if (inf.finished()) finished = true
              else if (!broken && n == 0 &&
                  (inf.needsInput() || inf.needsDictionary()))
                broken = true // truncated stream
              if (total > capPerMember) broken = true // bomb: abandon
            }
            consumed = inf.getBytesRead
          } finally inf.end()
          if (finished && !broken) {
            // 8-byte CRC32+ISIZE trailer; clamp if the tail is clipped
            val end = math.min(b.length.toLong, hdrEnd + consumed + 8L)
            out += new GenericInternalRow(Array[Any](
              i.toLong, end - i, total))
            i = end.toInt
            advanced = true
          }
        }
        if (!advanced) i += 1 // malformed candidate: re-anchor scan
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val Magic = "WARC/".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def magicAt(b: Array[Byte], i: Int): Boolean = {
    if (i + Magic.length > b.length) return false
    var k = 0
    while (k < Magic.length) {
      if (b(i + k) != Magic(k)) return false
      k += 1
    }
    true
  }

  /** One pass over inflated bytes → the records array ([[Schema]]).
    * Package-visible for the spec's direct vectors. */
  private[operators] def parse(b: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    // leading junk (or a non-WARC row): scan to the first magic
    while (i < b.length && !magicAt(b, i)) i += 1
    while (i < b.length && magicAt(b, i)) {
      // ---- header block: lines to the first empty line ----
      var warcType: String = null
      var uri: String = null
      var recId: String = null
      var cType: String = null
      var cLen: Long = -1L
      var p = i
      var headersEnd = -1
      while (headersEnd < 0 && p < b.length) {
        // line end: LF (optionally preceded by CR)
        var eol = p
        while (eol < b.length && b(eol) != '\n') eol += 1
        val lineEnd = if (eol > p && b(eol - 1) == '\r') eol - 1 else eol
        if (lineEnd == p) headersEnd = eol + 1 // empty line: body follows
        else {
          val line = new String(b, p, lineEnd - p,
            java.nio.charset.StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val name = line.substring(0, colon).trim.toLowerCase
            val value = line.substring(colon + 1).trim
            name match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-record-id" => recId = value
              case "content-type" => cType = value
              case "content-length" =>
                cLen = try value.toLong
                catch { case _: NumberFormatException => -1L }
              case _ =>
            }
          }
          if (eol >= b.length) headersEnd = b.length // truncated header
          else p = eol + 1
        }
      }
      if (headersEnd < 0) headersEnd = b.length
      if (cLen < 0 || warcType == null) return new GenericArrayData(out.toArray)
      val bodyStart = math.min(headersEnd, b.length)
      val bodyLen = math.min(cLen, (b.length - bodyStart).toLong)
      out += new GenericInternalRow(Array[Any](
        UTF8String.fromString(warcType),
        if (uri == null) null else UTF8String.fromString(uri),
        if (recId == null) null else UTF8String.fromString(recId),
        if (cType == null) null else UTF8String.fromString(cType),
        bodyStart.toLong, bodyLen))
      i = bodyStart + bodyLen.toInt
      // consume the inter-record CRLF run, then re-anchor on the magic
      while (i < b.length && (b(i) == '\r' || b(i) == '\n')) i += 1
      if (i < b.length && !magicAt(b, i)) {
        while (i < b.length && !magicAt(b, i)) i += 1 // skip splice junk
      }
    }
    new GenericArrayData(out.toArray)
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** The records column over plain or whole-file-gzipped WARC bytes. */
  def records(warc: Column): Column =
    B.column(WarcRecords(B.expression(warc)))

  /** Plain bytes of a possibly-gzipped WARC column ([[WarcInflate]]) —
    * what [[records]]' offsets index into. */
  def inflate(warc: Column): Column =
    B.column(WarcInflate(B.expression(warc)))

  /** One record's body bytes: a `substr` projection over the inflated
    * stream, no re-parse. `rec` is an element of [[records]]. */
  def body(warc: Column, rec: Column): Column =
    inflate(warc).substr(
      rec.getField("offset").cast("int") + lit(1),
      rec.getField("length").cast("int"))

  /** The gzip member index ([[WarcMembers]]) over record-gzipped bytes
    * — (offset, clen, ulen) per member in the COMPRESSED input. */
  def members(warc: Column): Column =
    B.column(WarcMembers(B.expression(warc)))

  /** One member's inflated bytes: a bounded per-record gunzip over the
    * compressed byte range — `substr` + [[WarcInflate]], no new
    * machinery. `m` is an element of [[members]]. */
  def member(warc: Column, m: Column): Column =
    inflate(warc.substr(
      m.getField("offset").cast("int") + lit(1),
      m.getField("clen").cast("int")))

  /** Deterministic per-record gzip ([[WarcGzip]]) — the write face of
    * the record-gzip layout. */
  def gzip(rec: Column): Column =
    B.column(WarcGzip(B.expression(rec)))
}
