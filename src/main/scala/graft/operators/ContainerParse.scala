package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM video CONTAINER parsing: dimensions, duration, codec id and
  * frame/cluster offsets straight from MP4 (ISO BMFF box) and Matroska
  * (EBML element) structure — no codec, no native library. This shrinks
  * the multimodal stub boundary to actual FRAME DECODE: everything a
  * pipeline needs to route, partition, size-estimate and frame-sample
  * video payloads is container-level and parses here for real
  * ([[Multimodal.extractVideoMeta]] is the batched Spark surface).
  *
  * Parsers return None on anything malformed — one bad row must not kill
  * a 100 TB job (same contract as [[Multimodal.decodeImage]]).
  *
  * Box/element layouts follow the public specs: ISO/IEC 14496-12 (ftyp,
  * moov/mvhd, trak/tkhd, mdia/hdlr, stbl/stsd/stsz/stco/co64) and the
  * Matroska/EBML RFC 8794 (EBML header, Segment, Info, Tracks, Cluster).
  */
object ContainerParse {

  /** Container-level metadata. `sampleOffsets` are absolute payload
    * offsets: MP4 chunk offsets (stco/co64) of the video track; for MKV,
    * the Cues seek index's cluster positions (rebased from
    * Segment-relative to absolute), falling back to top-level Cluster
    * element offsets for files written without Cues. `nSamples` is the
    * MP4 stsz sample count (a frame count for one-sample-per-frame video
    * tracks) or the MKV cue-point count; 0 for Cues-less MKV. */
  final case class VideoMeta(
      container: String,
      codec: String,
      width: Int,
      height: Int,
      durationSeconds: Double,
      nSamples: Int,
      sampleOffsets: Seq[Long],
      // May be a [[UniformSizes]] over a hostile header's declared count
      // (≈2^31): index/size it only — putting it element-wise into a Row,
      // or any toSeq/toArray/iterator drain, materializes gigabytes.
      sampleSizes: Seq[Long] = Nil) {
    // Keep toString O(1): the default case-class render would drain
    // sampleOffsets/sampleSizes element by element.
    override def toString: String =
      s"VideoMeta($container,$codec,${width}x$height,${durationSeconds}s," +
        s"nSamples=$nSamples,offsets=${sampleOffsets.length}," +
        s"sizes=${sampleSizes.length})"
  }

  /** Constant-value sample-size table (uniform stsz): O(1) memory for
    * ANY declared sample count, so a hostile header can't drive a
    * multi-GB materialization and a metadata-only moov (more samples
    * than the payload's own bytes) still parses. Downstream only ever
    * indexes/sizes it ([[Multimodal.sampleFramesReal]]). */
  private[operators] final case class UniformSizes(n: Int, u: Long)
      extends scala.collection.immutable.IndexedSeq[Long] {
    def length: Int = n
    def apply(i: Int): Long =
      if (i < 0 || i >= n)
        throw new IndexOutOfBoundsException(s"$i of $n")
      else u
    // The inherited Seq toString drains all n elements — at the hostile
    // ceiling that is a ~2^31-step loop, the exact DoS the O(1)
    // representation exists to avoid.
    override def toString: String = s"UniformSizes($n x $u)"
  }

  /** Sniffs the container by magic and parses accordingly. */
  def parseVideo(payload: Array[Byte]): Option[VideoMeta] =
    Option(payload).filter(_.length >= 12).flatMap { b =>
      if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
        parseMp4(b)
      else if ((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
        parseMkv(b)
      else None
    }

  // ------------------------------------------------------------------ MP4

  /** One box at `pos`: (type, payloadStart, payloadEnd, boxEnd). */
  private def boxAt(b: ByteBuffer, pos: Int, limit: Int)
      : Option[(String, Int, Int, Int)] = {
    if (pos + 8 > limit) return None
    val size32 = b.getInt(pos).toLong & 0xffffffffL
    val tpe = new String(Array(b.get(pos + 4), b.get(pos + 5),
      b.get(pos + 6), b.get(pos + 7)), "ISO-8859-1")
    val (size, hdr) =
      if (size32 == 1L) {
        if (pos + 16 > limit) return None
        (b.getLong(pos + 8), 16)
      } else if (size32 == 0L) ((limit - pos).toLong, 8) // to end of file
      else (size32, 8)
    if (size < hdr || pos + size > limit) None
    else Some((tpe, pos + hdr, pos + size.toInt, pos + size.toInt))
  }

  /** All child boxes of [start, end). */
  private def boxes(b: ByteBuffer, start: Int, end: Int)
      : Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = start
    while (pos < end) {
      boxAt(b, pos, end) match {
        case Some((t, ps, pe, next)) => out += ((t, ps, pe)); pos = next
        case None => return out.result() // truncated tail: keep what parsed
      }
    }
    out.result()
  }

  private def find(b: ByteBuffer, start: Int, end: Int,
      tpe: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (t, s, e) if t == tpe => (s, e) }

  def parseMp4(payload: Array[Byte]): Option[VideoMeta] =
    try {
      val b = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      val top = boxes(b, 0, payload.length)
      if (!top.exists(_._1 == "ftyp")) return None
      val (moovS, moovE) = top.collectFirst {
        case ("moov", s, e) => (s, e)
      }.getOrElse(return None)

      // mvhd: movie timescale + duration
      val (mvS, _) = find(b, moovS, moovE, "mvhd").getOrElse(return None)
      val mvVer = b.get(mvS) & 0xff
      val (timescale, duration) =
        if (mvVer == 1)
          (b.getInt(mvS + 20).toLong & 0xffffffffL, b.getLong(mvS + 24))
        else
          (b.getInt(mvS + 12).toLong & 0xffffffffL,
            b.getInt(mvS + 16).toLong & 0xffffffffL)
      val durationSec =
        if (timescale == 0) 0.0 else duration.toDouble / timescale

      // the VIDEO trak = the one whose mdia/hdlr handler is 'vide'
      val vtrak = boxes(b, moovS, moovE).collect {
        case ("trak", s, e) => (s, e)
      }.find { case (ts, te) =>
        (for {
          (mdS, mdE) <- find(b, ts, te, "mdia")
          (hdS, _) <- find(b, mdS, mdE, "hdlr")
        } yield new String(Array(b.get(hdS + 8), b.get(hdS + 9),
          b.get(hdS + 10), b.get(hdS + 11)), "ISO-8859-1") == "vide")
          .getOrElse(false)
      }.getOrElse(return None)
      val (tS, tE) = vtrak

      // tkhd: presentation width/height, 16.16 fixed point
      val (tkS, _) = find(b, tS, tE, "tkhd").getOrElse(return None)
      val tkVer = b.get(tkS) & 0xff
      val dimOff = tkS + 4 + (if (tkVer == 1) 32 else 20) + 52
      val width = b.getInt(dimOff) >>> 16
      val height = b.getInt(dimOff + 4) >>> 16

      // stbl: codec (stsd first entry fourcc), sample count (stsz),
      // chunk offsets (stco / co64)
      val (stS, stE) = (for {
        (mdS, mdE) <- find(b, tS, tE, "mdia")
        (mfS, mfE) <- find(b, mdS, mdE, "minf")
        st <- find(b, mfS, mfE, "stbl")
      } yield st).getOrElse(return None)
      val codec = find(b, stS, stE, "stsd").map { case (s, _) =>
        new String(Array(b.get(s + 12), b.get(s + 13), b.get(s + 14),
          b.get(s + 15)), "ISO-8859-1")
      }.getOrElse("")
      val (nSamples, sampleSizes) = find(b, stS, stE, "stsz")
        .map { case (s, e) =>
          val uniform = b.getInt(s + 4)
          val n = b.getInt(s + 8)
          // n is payload-controlled: bound it BEFORE materializing. A
          // malformed box declaring n ≈ Int.MaxValue would otherwise
          // drive a multi-GB allocation — and OutOfMemoryError is not
          // NonFatal, so it would kill the executor instead of failing
          // this row. Non-uniform: the box must physically hold its
          // 4-byte-per-sample table. Uniform: any declared count is
          // O(1) memory through [[UniformSizes]] — no payload-size
          // bound, because a metadata-only file (moov without mdat) may
          // legitimately declare more samples than its own byte length.
          val bound = if (uniform != 0) Int.MaxValue.toLong
                      else (e - s - 12L) / 4
          if (n < 0 || n > bound)
            throw new IllegalArgumentException(s"stsz declares $n samples")
          val sizes: Seq[Long] =
            if (uniform != 0) UniformSizes(n, uniform.toLong & 0xffffffffL)
            else (0 until n).map(i =>
              b.getInt(s + 12 + 4 * i).toLong & 0xffffffffL)
          (n, sizes)
        }.getOrElse((0, Nil))
      val offsets: Seq[Long] =
        find(b, stS, stE, "stco").map { case (s, _) =>
          val n = b.getInt(s + 4)
          (0 until n).map(i => b.getInt(s + 8 + 4 * i).toLong & 0xffffffffL)
        }.orElse(find(b, stS, stE, "co64").map { case (s, _) =>
          val n = b.getInt(s + 4)
          (0 until n).map(i => b.getLong(s + 8 + 8 * i))
        }).getOrElse(Nil)

      Some(VideoMeta("mp4", codec, width, height, durationSec, nSamples,
        offsets, sampleSizes))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------ MKV

  /** EBML variable-length integer at `pos`: (value, bytesRead). `keepMarker`
    * keeps the length-marker bit (element IDs); size fields drop it. An
    * all-ones size is "unknown" → None value. */
  private def vint(b: Array[Byte], pos: Int, keepMarker: Boolean)
      : Option[(Option[Long], Int)] = {
    if (pos >= b.length) return None
    val first = b(pos) & 0xff
    if (first == 0) return None
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (pos + len > b.length) return None
    var v: Long = if (keepMarker) first else first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
    val unknown = !keepMarker &&
      v == (1L << (7 * len)) - 1 // all value bits set
    Some((if (unknown) None else Some(v), len))
  }

  /** Children of an EBML master element body [start, end):
    * (id, payloadStart, payloadEnd). Unknown-size children extend to the
    * parent's end (legal only for Segment/Cluster — good enough here). */
  private def ebmlChildren(b: Array[Byte], start: Int, end: Int)
      : Seq[(Long, Int, Int)] = {
    val out = Seq.newBuilder[(Long, Int, Int)]
    var pos = start
    while (pos < end) {
      val parsed = for {
        (Some(id), idLen) <- vint(b, pos, keepMarker = true)
        (sz, szLen) <- vint(b, pos + idLen, keepMarker = false)
      } yield (id, pos + idLen + szLen, sz)
      parsed match {
        case Some((id, ps, sz)) =>
          val pe = sz.map(s => ps + s.toInt).getOrElse(end)
          if (pe > end) return out.result()
          out += ((id, ps, pe))
          pos = pe
        case None => return out.result()
      }
    }
    out.result()
  }

  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double =
    (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, s, e).toInt)
      case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, s, e))
      case _ => 0.0
    }

  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val InfoDuration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B675L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val BlockEl = 0xA1L
  private val Cues = 0x1C53BB6BL
  private val CuePoint = 0xBBL
  private val CueTime = 0xB3L
  private val CueTrackPositions = 0xB7L
  private val CueClusterPosition = 0xF1L

  /** Per-frame absolute byte ranges out of one (Simple)Block body
    * [s, e): decodes the block header — track-number vint, 2-byte
    * relative timestamp, flags — and the three lacing schemes of RFC
    * 8794 §6.2.4 (Xiph: 255-saturated size bytes; EBML: first size as a
    * vint, then signed-vint deltas; fixed: equal split), returning
    * `Some(Nil)` for another track's block and `None` for a malformed
    * one (caller skips it — one bad block must not drop the row). */
  private def blockFrames(b: Array[Byte], s: Int, e: Int,
      videoTrack: Long): Option[Seq[(Long, Long)]] = {
    val (trackOpt, tLen) = vint(b, s, keepMarker = false).getOrElse(return None)
    val track = trackOpt.getOrElse(return None)
    if (track != videoTrack) return Some(Nil)
    val flagsPos = s + tLen + 2 // skip the int16 relative timestamp
    if (flagsPos >= e) return None
    val lacing = (b(flagsPos) >> 1) & 0x3
    if (lacing == 0) // no lacing: the rest of the body is ONE frame
      return Some(Seq((flagsPos + 1L, (e - flagsPos - 1).toLong)))
    if (flagsPos + 1 >= e) return None
    val count = (b(flagsPos + 1) & 0xff) + 1
    var p = flagsPos + 2
    // sizes of the first count-1 frames; the last is the remainder
    val head = Array.newBuilder[Long]
    lacing match {
      case 1 => // Xiph: each size = sum of bytes until one < 255
        var i = 0
        while (i < count - 1) {
          var sz = 0L; var more = true
          while (more) {
            if (p >= e) return None
            val v = b(p) & 0xff; sz += v; more = v == 255; p += 1
          }
          head += sz; i += 1
        }
      case 3 => // EBML: first size plain vint, then signed-vint deltas
        if (count > 1) {
          val (szOpt, len) = vint(b, p, keepMarker = false)
            .getOrElse(return None)
          var prev = szOpt.getOrElse(return None)
          p += len; head += prev
          var i = 1
          while (i < count - 1) {
            val (dOpt, dLen) = vint(b, p, keepMarker = false)
              .getOrElse(return None)
            val raw = dOpt.getOrElse(return None)
            prev += raw - ((1L << (7 * dLen - 1)) - 1) // un-bias signed vint
            if (prev < 0) return None
            p += dLen; head += prev; i += 1
          }
        }
      case _ => // fixed-size: no lace sizes; equal split of the rest
        val rest = e - p
        if (count == 0 || rest < 0 || rest % count != 0) return None
        val each = rest.toLong / count
        (0 until count - 1).foreach(_ => head += each)
    }
    val sizes = head.result()
    val used = sizes.sum
    val last = (e - p) - used
    if (last < 0) return None
    var off = p.toLong
    val out = Seq.newBuilder[(Long, Long)]
    (sizes :+ last).foreach { sz => out += ((off, sz)); off += sz }
    Some(out.result())
  }

  /** All video-track frame ranges in a Cluster body [s, e):
    * SimpleBlocks directly, Blocks through their BlockGroup. */
  private def clusterFrames(b: Array[Byte], s: Int, e: Int,
      videoTrack: Long): Seq[(Long, Long)] =
    ebmlChildren(b, s, e).flatMap {
      case (SimpleBlock, bs, be) =>
        blockFrames(b, bs, be, videoTrack).getOrElse(Nil)
      case (BlockGroup, gs, ge) =>
        ebmlChildren(b, gs, ge).collect {
          case (BlockEl, bs, be) =>
            blockFrames(b, bs, be, videoTrack).getOrElse(Nil)
        }.flatten
      case _ => Nil
    }

  def parseMkv(payload: Array[Byte]): Option[VideoMeta] =
    try {
      val top = ebmlChildren(payload, 0, payload.length)
      val (segS, segE) = top.collectFirst {
        case (id, s, e) if id == Segment => (s, e)
      }.getOrElse(return None)
      val seg = ebmlChildren(payload, segS, segE)

      var scale = 1000000L // default: 1 ms in ns
      var durTicks = 0.0
      seg.collectFirst { case (id, s, e) if id == Info => (s, e) }
        .foreach { case (s, e) =>
          ebmlChildren(payload, s, e).foreach {
            case (TimestampScale, cs, ce) =>
              scale = ebmlUint(payload, cs, ce)
            case (InfoDuration, cs, ce) =>
              durTicks = ebmlFloat(payload, cs, ce)
            case _ =>
          }
        }
      val durationSec = durTicks * scale / 1e9

      var codec = ""; var width = 0; var height = 0
      var videoTrack: Option[Long] = None
      seg.collectFirst { case (id, s, e) if id == Tracks => (s, e) }
        .foreach { case (s, e) =>
          ebmlChildren(payload, s, e).foreach {
            case (TrackEntry, ts, te) =>
              val kids = ebmlChildren(payload, ts, te)
              val isVideo = kids.exists { case (id, cs, ce) =>
                id == TrackType && ebmlUint(payload, cs, ce) == 1L }
              if (isVideo && width == 0) kids.foreach {
                case (CodecID, cs, ce) =>
                  codec = new String(payload, cs, ce - cs, "UTF-8")
                case (TrackNumber, cs, ce) =>
                  videoTrack = Some(ebmlUint(payload, cs, ce))
                case (VideoEl, cs, ce) =>
                  ebmlChildren(payload, cs, ce).foreach {
                    case (PixelWidth, ws, we) =>
                      width = ebmlUint(payload, ws, we).toInt
                    case (PixelHeight, hs, he) =>
                      height = ebmlUint(payload, hs, he).toInt
                    case _ =>
                  }
                case _ =>
              }
            case _ =>
          }
        }
      if (width == 0 && height == 0 && codec.isEmpty) return None
      // Sample-exact path (MP4 parity): when the payload carries the
      // Clusters themselves AND the video TrackEntry declares its
      // TrackNumber, decode every (Simple)Block's lacing into per-frame
      // absolute byte ranges — the same (offset, size) space stsz/stco
      // yield. Cues/cluster granularity remains the fallback for
      // metadata-only payloads (moov-equivalent without media data).
      val frames: Seq[(Long, Long)] = videoTrack match {
        case Some(tn) => seg.collect {
          case (Cluster, cs, ce) => clusterFrames(payload, cs, ce, tn)
        }.flatten
        case None => Nil
      }
      if (frames.nonEmpty)
        return Some(VideoMeta("mkv", codec, width, height, durationSec,
          frames.size, frames.map(_._1), frames.map(_._2)))
      // Prefer the Cues seek index (CueClusterPosition is relative to the
      // Segment payload start — rebase to absolute offsets, same space as
      // MP4's stco); fall back to top-level Cluster element offsets for
      // files written without Cues.
      val cues: Seq[(Long, Long)] = seg
        .collectFirst { case (id, s, e) if id == Cues => (s, e) }
        .map { case (s, e) =>
          ebmlChildren(payload, s, e).collect {
            case (CuePoint, ps, pe) =>
              val kids = ebmlChildren(payload, ps, pe)
              val time = kids.collectFirst {
                case (CueTime, cs, ce) => ebmlUint(payload, cs, ce) }
              val cpos = kids.flatMap {
                case (CueTrackPositions, ts, te) =>
                  ebmlChildren(payload, ts, te).collectFirst {
                    case (CueClusterPosition, cs, ce) =>
                      segS + ebmlUint(payload, cs, ce)
                  }
                case _ => None
              }.headOption
              (time, cpos)
          }.collect { case (Some(t), Some(p)) => (t, p) }
        }.getOrElse(Nil)
      val offsets: Seq[Long] =
        if (cues.nonEmpty) cues.map(_._2)
        else seg.collect { case (id, s, _) if id == Cluster => s.toLong }
      Some(VideoMeta("mkv", codec, width, height, durationSec,
        cues.size, offsets))
    } catch { case scala.util.control.NonFatal(_) => None }
}
