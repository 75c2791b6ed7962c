package graft

import org.apache.spark.sql.functions._

import graft.operators.{HtmlExtract, WarcParse}

/** Pins the WARC container parser: record segmentation, header
  * extraction, body byte ranges, whole-file gzip (concatenated
  * members), and the crawl-reality contract — truncation, bad
  * lengths, splice junk and bombs all degrade deterministically,
  * never throw. */
class WarcParseSpec extends SparkSpec {
  import spark.implicits._

  private def rec(wtype: String, uri: String, body: String,
      extra: String = "", declaredLen: Long = -1L): String = {
    val len = if (declaredLen >= 0) declaredLen
      else body.getBytes("UTF-8").length.toLong
    s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
      (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") +
      s"WARC-Record-ID: <urn:uuid:$wtype-1>\r\n" +
      "Content-Type: text/html\r\n" +
      extra +
      s"Content-Length: $len\r\n\r\n$body\r\n\r\n"
  }

  private def recordsOf(bytes: Array[Byte])
      : Seq[(String, String, Long, Long)] =
    Seq(Tuple1(bytes)).toDF("w")
      .select(explode(WarcParse.records($"w")).as("r"))
      .select($"r.warc_type", $"r.target_uri", $"r.offset", $"r.length")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))

  private def bodiesOf(bytes: Array[Byte]): Seq[String] =
    Seq(Tuple1(bytes)).toDF("w")
      .select(explode(WarcParse.records($"w")).as("r"), $"w")
      .select(WarcParse.body($"w", $"r").cast("string"))
      .collect().toSeq.map(_.getString(0))

  test("record segmentation: types, URIs and exact body byte ranges") {
    val w = (rec("warcinfo", null, "version 1") +
      rec("response", "http://x.test/a", "<p>alpha</p>") +
      rec("response", "http://x.test/b", "<p>beta</p>"))
      .getBytes("UTF-8")
    val got = recordsOf(w)
    assert(got.map(_._1) == Seq("warcinfo", "response", "response"))
    assert(got.map(_._2) == Seq(null, "http://x.test/a", "http://x.test/b"))
    assert(bodiesOf(w) ==
      Seq("version 1", "<p>alpha</p>", "<p>beta</p>"))
  }

  test("whole-file gzip, including concatenated members, inflates " +
      "transparently; plain bytes pass through") {
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    // two gzip MEMBERS back to back — the warc.gz layout
    val two = gz(rec("response", "http://x.test/a", "AAA")) ++
      gz(rec("response", "http://x.test/b", "BBB"))
    assert(bodiesOf(two) == Seq("AAA", "BBB"))
    val plain = rec("response", "http://x.test/c", "CCC").getBytes("UTF-8")
    assert(bodiesOf(plain) == Seq("CCC"))
  }

  test("crawl reality: bare-LF headers, junk between records, " +
      "over-declared length clamps, bad length stops cleanly, " +
      "truncated body, empty and null input — never a throw") {
    // bare-LF record
    val lf = ("WARC/1.0\nWARC-Type: response\nContent-Length: 2\n\nXY"
      ).getBytes("UTF-8")
    assert(recordsOf(lf).map(_._1) == Seq("response"))
    assert(bodiesOf(lf) == Seq("XY"))
    // splice junk between two records is skipped by magic re-anchor
    val spliced = (rec("response", "http://x.test/a", "AAA") +
      "#### corrupted splice ####" +
      rec("response", "http://x.test/b", "BBB")).getBytes("UTF-8")
    assert(bodiesOf(spliced) == Seq("AAA", "BBB"))
    // declared length past EOF clamps to available bytes
    val over = rec("response", "http://x.test/t", "SHORT",
      declaredLen = 5000L).getBytes("UTF-8")
    val ovGot = recordsOf(over)
    assert(ovGot.size == 1 && ovGot.head._4 == 9L) // SHORT + \r\n\r\n
    // a garbled Content-Length ends the parse at that record,
    // keeping the ones before it
    val bad = (rec("response", "http://x.test/a", "AAA") +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: banana\r\n\r\nZZ"
      ).getBytes("UTF-8")
    assert(recordsOf(bad).size == 1)
    // truncated mid-header
    assert(recordsOf("WARC/1.0\r\nWARC-Ty".getBytes("UTF-8")).isEmpty)
    // non-WARC noise, empty, null
    assert(recordsOf("not a warc file at all".getBytes("UTF-8")).isEmpty)
    assert(recordsOf(Array.empty[Byte]).isEmpty)
    val n = Seq(Tuple1(null: Array[Byte])).toDF("w")
      .select(size(WarcParse.records($"w"))).head().getInt(0)
    assert(n == 0)
    // gzip bomb: inflation caps at MaxInflate — truncated parse, no OOM
    val bombPayload = rec("response", "http://x.test/bomb",
      "A" * 1000000)
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    (1 to 300).foreach(_ => g.write(bombPayload.getBytes("UTF-8")))
    g.close()
    val bombed = recordsOf(bo.toByteArray) // 300 MB inflated > cap
    // cap = 256 MiB; records are ~1 MB each → at most ~269 parse, the
    // other ~30 MB of declared payload never materializes
    assert(bombed.size <= 270 && bombed.nonEmpty,
      s"expected the bomb to truncate at ~269 records: ${bombed.size}")
  }

  // ---- per-record gzip members (the Common Crawl layout) -------------

  private def gzBytes(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  private def membersOf(bytes: Array[Byte]): Seq[(Long, Long, Long)] =
    Seq(Tuple1(bytes)).toDF("w")
      .select(explode(WarcParse.members($"w")).as("m"))
      .select($"m.offset", $"m.clen", $"m.ulen")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("member index: per-record gzip members carry exact compressed " +
      "byte ranges and true inflated sizes") {
    val r1 = rec("warcinfo", null, "version 1")
    val r2 = rec("response", "http://x.test/a", "<p>alpha</p>")
    val r3 = rec("response", "http://x.test/b", "<p>beta</p>")
    val (g1, g2, g3) = (gzBytes(r1), gzBytes(r2), gzBytes(r3))
    val cc = g1 ++ g2 ++ g3
    val ms = membersOf(cc)
    assert(ms.map(_._1) ==
      Seq(0L, g1.length.toLong, (g1.length + g2.length).toLong))
    assert(ms.map(_._2) ==
      Seq(g1.length.toLong, g2.length.toLong, g3.length.toLong))
    assert(ms.map(_._3) == Seq(r1, r2, r3).map(
      _.getBytes("UTF-8").length.toLong))
    // each member inflates INDEPENDENTLY and parses to its one record
    val got = Seq(Tuple1(cc)).toDF("w")
      .select(explode(WarcParse.members($"w")).as("m"), $"w")
      .select(explode(WarcParse.records(
        WarcParse.member($"w", $"m"))).as("r"))
      .select($"r.warc_type", $"r.target_uri")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    assert(got == Seq(("warcinfo", null), ("response", "http://x.test/a"),
      ("response", "http://x.test/b")))
  }

  test("member index: gzip write face round-trips (deterministic " +
      "bytes) and FNAME/FEXTRA headers parse") {
    val r1 = rec("response", "http://x.test/a", "<p>alpha</p>")
    // the column-level gzip face produces the same bytes as the JDK
    val viaCol = Seq(Tuple1(r1.getBytes("UTF-8"))).toDF("b")
      .select(WarcParse.gzip($"b")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaCol, gzBytes(r1)))
    // a member with FNAME + FEXTRA header fields still delimits: build
    // one by patching FLG and splicing the optional fields in
    val plain = gzBytes(r1)
    val name = "rec-0.warc\u0000".getBytes("ISO-8859-1")
    val extra = Array[Byte](4, 0, 'G', 'Z', 0, 0) // XLEN=4 + 4 payload
    val patched = new java.io.ByteArrayOutputStream()
    patched.write(plain, 0, 3)
    patched.write((plain(3) | 4 | 8).toByte) // FLG |= FEXTRA|FNAME
    patched.write(plain, 4, 6) // MTIME/XFL/OS
    patched.write(extra)
    patched.write(name)
    patched.write(plain, 10, plain.length - 10)
    val two = patched.toByteArray ++ gzBytes(r1)
    val ms = membersOf(two)
    assert(ms.length == 2)
    assert(ms(0)._1 == 0L && ms(0)._2 == patched.size().toLong)
    assert(ms(1)._1 == patched.size().toLong)
  }

  test("member index degrades: truncated final member drops, junk " +
      "between members skips, a per-member bomb cap abandons only " +
      "that member") {
    val r1 = rec("warcinfo", null, "version 1")
    val r2 = rec("response", "http://x.test/a", "<p>alpha</p>")
    val (g1, g2) = (gzBytes(r1), gzBytes(r2))
    // truncation mid-second-member: first member survives
    val truncated = (g1 ++ g2).take(g1.length + g2.length / 2)
    val mt = membersOf(truncated)
    assert(mt.map(_._1) == Seq(0L))
    // splice junk between members: both found (re-anchor scan)
    val junk = "NOISE-NOT-GZIP".getBytes("UTF-8")
    val spliced = g1 ++ junk ++ g2
    val msp = membersOf(spliced)
    assert(msp.map(_._1) == Seq(0L, (g1.length + junk.length).toLong))
    // bomb cap: a member inflating past the cap is abandoned; its
    // neighbors survive (direct kernel vector — the expression face
    // uses the 256 MB production cap)
    val bomb = gzBytes("x" * 100000) // inflates 100k ≫ the 1k test cap
    val arr = graft.operators.WarcParse
      .scanMembers(g1 ++ bomb ++ g2, capPerMember = 1024L)
    assert(arr.numElements() == 2)
    assert(arr.getStruct(0, 3).getLong(0) == 0L)
    assert(arr.getStruct(1, 3).getLong(0) ==
      (g1.length + bomb.length).toLong)
  }

  test("the ingestion story composes: WARC -> HtmlExtract -> text") {
    val w = (rec("warcinfo", null, "version 1") +
      rec("response", "http://x.test/page",
        "<html><body><h1>Title</h1><p>the body text</p>" +
          "<script>junk()</script></body></html>"))
      .getBytes("UTF-8")
    val got = Seq(Tuple1(w)).toDF("w")
      .select(explode(WarcParse.records($"w")).as("r"), $"w")
      .filter($"r.warc_type" === "response")
      .select(HtmlExtract.text(
        WarcParse.body($"w", $"r").cast("string")))
      .head().getString(0)
    assert(got == "Title\nthe body text")
  }
}
