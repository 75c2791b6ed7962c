package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("synthetic media table matches the canonical schema") {
    val m = Multimodal.synthetic(spark, 10)
    assert(m.schema("payload").dataType
      == org.apache.spark.sql.types.BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    assert(m.count() == 10)
  }

  test("stubDecode is deterministic on byte content") {
    val a = Multimodal.stubDecode(Array[Byte](1, 2, 3, 4, 5))
    val b = Multimodal.stubDecode(Array[Byte](1, 2, 3, 4, 5))
    val c = Multimodal.stubDecode(Array[Byte](1, 2, 3, 4, 6))
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.length == Multimodal.featureDim)
  }

  test("extractFeatures runs batched over partitions") {
    val m = Multimodal.synthetic(spark, 100).repartition(4)
    val f = Multimodal.extractFeatures(m, batchSize = 16)
    assert(f.count() == 100)
    val row = f.filter(col("media_id") === 7L).head
    assert(row.getSeq[Float](1).length == Multimodal.featureDim)
    // deterministic across runs
    val again = Multimodal.extractFeatures(m, batchSize = 16)
      .filter(col("media_id") === 7L).head
    assert(row.getSeq[Float](1) == again.getSeq[Float](1))
  }

  test("resizeMeta rewrites metadata, keeps payload") {
    val m = Multimodal.synthetic(spark, 3)
    val r = Multimodal.resizeMeta(m, 4, 4)
    val row = r.head
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("width") == 4 && meta.getAs[Int]("height") == 4)
    assert(r.select(length(col("payload"))).head.getInt(0) == 64)
  }

  test("sampleFrames emits strided frame byte-ranges") {
    val m = Multimodal.synthetic(spark, 1) // 64 bytes, 4 frames → 16 b/frame
    val frames = Multimodal.sampleFrames(m, stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(frames.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 32L))
    assert(frames.forall(_.getAs[Long]("byte_len") == 16L))
  }

  test("real PNG decode: features come from actual pixels") {
    val imgs = Multimodal.syntheticImages(spark, 5, w = 16, h = 16)
      .repartition(2)
    val feats = Multimodal.extractImageFeatures(imgs, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size == 5)
    // Recompute image 3's expected 4x4 grid means from the pixel formula
    // (independent of the PNG round-trip: PNG is lossless).
    val id = 3L
    val grid = 4
    val sums = new Array[Double](16)
    val counts = new Array[Long](16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val rgb = Multimodal.syntheticRgb(id, x, y)
      val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
        (rgb & 0xff)) / (3.0 * 255.0)
      val cell = (y * grid / 16) * grid + (x * grid / 16)
      sums(cell) += gray; counts(cell) += 1
    }
    val expected = (0 until 16).map(i => (sums(i) / counts(i)).toFloat)
    val got = feats(id)
    assert(got.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-6 },
      s"pixel-derived features mismatch:\n got=$got\n exp=$expected")
  }

  test("undecodable payloads yield null features, not fake ones") {
    val junk = Multimodal.synthetic(spark, 3) // md5 bytes, not an image
    val feats = Multimodal.extractImageFeatures(junk).collect()
    assert(feats.length == 3 && feats.forall(_.isNullAt(1)))
  }

  test("corrupt payload with a valid PNG magic header decodes to None") {
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A) ++ Array.fill[Byte](32)(0x42)
    assert(Multimodal.decodeImage(corrupt).isEmpty)
  }

  test("real resize: payload re-encoded at target dims") {
    val imgs = Multimodal.syntheticImages(spark, 3, w = 16, h = 16)
    val resized = Multimodal.resizeImages(imgs, 8, 8)
    val row = resized.orderBy("media_id").head
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[String]("format") == "png")
    assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    val img = Multimodal.decodeImage(row.getAs[Array[Byte]]("payload"))
    assert(img.isDefined)
    assert(img.get.getWidth == 8 && img.get.getHeight == 8)
  }

  test("end-to-end: media payloads → features → ANN neighbors") {
    val media = Multimodal.synthetic(spark, 60)
    val feats = Multimodal.extractFeatures(media)
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val queries = feats.filter(col("vec_id") % 20 === 0)
    val top = graft.operators.Similarity.bruteTopK(feats, queries, k = 3)
    assert(top.count() == queries.count() * 3)
    // deterministic: same pipeline, same neighbors
    val again = graft.operators.Similarity.bruteTopK(
      Multimodal.extractFeatures(Multimodal.synthetic(spark, 60))
        .withColumnRenamed("media_id", "vec_id")
        .withColumnRenamed("features", "embedding"),
      queries, k = 3)
    assert(top.collect().map(_.toString).sorted.toSeq
      == again.collect().map(_.toString).sorted.toSeq)
  }

  test("real WAV decode: features match the analytic signal") {
    val media = Multimodal.syntheticWavs(spark, 4, sampleRate = 8000,
      nSamples = 4000)
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size == 4 && feats.values.forall(_ != null))
    feats.foreach { case (id, f) =>
      val Seq(rate, ch, n, rms, peak, zcr) = f.toSeq
      assert(rate == 8000.0f && ch == 1.0f && n == 4000.0f,
        s"id=$id header mismatch: $f")
      val amp = 0.2 + 0.1 * (id % 5)
      val freq = 200.0 + 100.0 * (id % 8)
      // sine RMS = amp/sqrt(2); quantization + windowing ~ small error
      assert(math.abs(rms - amp / math.sqrt(2)) < 0.01,
        s"id=$id rms=$rms want ~${amp / math.sqrt(2)}")
      assert(math.abs(peak - amp) < 0.01, s"id=$id peak=$peak want ~$amp")
      // sine crosses zero twice per cycle: zcr ~ 2 * freq / rate
      assert(math.abs(zcr - 2 * freq / 8000.0) < 0.005,
        s"id=$id zcr=$zcr want ~${2 * freq / 8000.0}")
    }
  }

  test("G.711 mu-law and A-law decode: graft's expansion tables match " +
      "the JDK codec sample-for-sample, and features stay analytic") {
    // DIFFERENTIAL check: the fixtures compand through the JDK's own
    // G.711 encoder; graft decodes with its OWN tables. Cross-check
    // the raw sample streams against the JDK's expansion directly.
    for (aLaw <- Seq(false, true)) {
      val payload = Multimodal.g711Wav(3L, aLaw, 8000, 2000)
      val ours = Multimodal.decodeWav(payload).get._2
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val pcmFmt = new javax.sound.sampled.AudioFormat(
        8000f, 16, 1, true, false)
      val jdk = javax.sound.sampled.AudioSystem
        .getAudioInputStream(pcmFmt, ais).readAllBytes()
      assert(ours.length == jdk.length / 2)
      var maxDiff = 0.0
      var i = 0
      while (i < ours.length) {
        val ref = ((jdk(2 * i + 1) << 8) | (jdk(2 * i) & 0xff)).toDouble /
          32768.0
        maxDiff = math.max(maxDiff, math.abs(ours(i) - ref))
        i += 1
      }
      assert(maxDiff <= 4.0 / 32768.0,
        s"aLaw=$aLaw: expansion diverges from the JDK codec by $maxDiff")
    }
    // and the batched feature path sees companded WAVs like any other
    val media = Multimodal.syntheticG711Wavs(spark, 4, aLaw = false)
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size == 4 && feats.values.forall(_ != null))
    feats.foreach { case (id, f) =>
      val Seq(rate, ch, _, rms, _, zcr) = f.toSeq
      val amp = 0.2 + 0.1 * (id % 5)
      val freq = 200.0 + 100.0 * (id % 8)
      assert(rate == 8000.0f && ch == 1.0f)
      // mu-law is logarithmic 8-bit: ~2% signal-level tolerance
      assert(math.abs(rms - amp / math.sqrt(2)) < 0.02,
        s"id=$id rms=$rms want ~${amp / math.sqrt(2)}")
      assert(math.abs(zcr - 2 * freq / 8000.0) < 0.01,
        s"id=$id zcr=$zcr")
    }
  }

  test("IMA ADPCM decode: graft's own RIFF walk + step tables recover " +
      "the signal, and hostile headers cap out instead of throwing") {
    val media = Multimodal.syntheticAdpcmWavs(spark, 4)
    val feats = Multimodal.extractAudioFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.size == 4 && feats.values.forall(_ != null))
    feats.foreach { case (id, f) =>
      val Seq(rate, ch, n, rms, _, zcr) = f.toSeq
      val amp = 0.2 + 0.1 * (id % 5)
      val freq = 200.0 + 100.0 * (id % 8)
      assert(rate == 8000.0f && ch == 1.0f && n == 8 * 505.0f,
        s"id=$id header mismatch: $f")
      // ADPCM is lossy (4-bit residuals): 5% on RMS, looser on ZCR
      assert(math.abs(rms - amp / math.sqrt(2)) < 0.05 * amp + 0.01,
        s"id=$id rms=$rms want ~${amp / math.sqrt(2)}")
      assert(math.abs(zcr - 2 * freq / 8000.0) < 0.02, s"id=$id zcr=$zcr")
    }
    // junk safety: truncations and bit flips must never throw (a short
    // payload may legally decode its surviving whole blocks)
    val good = Multimodal.imaAdpcmWav(1L, 8000, 8)
    for (cut <- Seq(3, 11, 20, 43, 100, good.length - 1))
      Multimodal.decodeImaAdpcmWav(good.take(cut))
    val flipped = good.clone()
    flipped(21) = (flipped(21) ^ 0x5a).toByte // fmt chunk corruption
    Multimodal.decodeImaAdpcmWav(flipped) // must not throw
    // block-align lying past the data: bounded, returns None
    val lying = good.clone()
    lying(32) = 0xff.toByte; lying(33) = 0x7f.toByte
    assert(Multimodal.decodeImaAdpcmWav(lying).isEmpty)
  }

  test("non-WAV bytes yield null audio features") {
    import spark.implicits._
    val junk = Seq((1L, "definitely not riff".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.extractAudioFeatures(junk).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }

  // ------------------------------------------------ video container parse

  /** Minimal ISO BMFF writer: box = size(4) + fourcc + payload. */
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(tpe.getBytes("ISO-8859-1")).put(body)
    bb.array()
  }
  private def be32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def be16(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(2).putShort(v.toShort).array()

  /** Hand-built minimal MP4: ftyp + moov(mvhd, trak(tkhd, mdia(hdlr,
    * minf(stbl(stsd, stsz, stco))))) + mdat. 640×360 'avc1', timescale
    * 1000, duration 2500 ms, 3 samples, chunk offsets 1000/2000/3000. */
  private def miniMp4(): Array[Byte] =
    mp4With("avc1", Seq(100, 120, 80), Seq(1000, 2000, 3000),
      Array.fill(16)(0x42.toByte))

  /** The miniMp4 skeleton with codec, sample tables and mdat body as
    * parameters (sizes/offsets list lengths must match). */
  private def mp4With(codec: String, sizes: Seq[Int], offsets: Seq[Int],
      mdatBody: Array[Byte]): Array[Byte] = {
    require(sizes.size == offsets.size)
    val ftyp = box("ftyp", "isom".getBytes, be32(512),
      "isomiso2".getBytes)
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0), // v0
      be32(0), be32(0),      // ctime mtime
      be32(1000), be32(2500), // timescale, duration (2.5 s)
      be32(0x00010000), be16(0x0100), be16(0), be32(0), be32(0),
      Array.fill(36)(0.toByte), // matrix
      Array.fill(24)(0.toByte), // pre_defined
      be32(2))                  // next track id
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
      be32(0), be32(0), be32(1), be32(0), be32(2500), // times/id/dur
      Array.fill(8)(0.toByte), be16(0), be16(0), be16(0), be16(0),
      Array.fill(36)(0.toByte),
      be32(640 << 16), be32(360 << 16)) // 16.16 fixed
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
      "vide".getBytes, Array.fill(12)(0.toByte), Array[Byte](0))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
      box(codec, Array.fill(70)(0.toByte)))
    val stsz = box("stsz", Array[Byte](0, 0, 0, 0),
      be32(0), be32(sizes.size),
      sizes.map(be32).toArray.flatten)
    val stco = box("stco", Array[Byte](0, 0, 0, 0), be32(offsets.size),
      offsets.map(be32).toArray.flatten)
    val stbl = box("stbl", stsd, stsz, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mdat = box("mdat", mdatBody)
    ftyp ++ moov ++ mdat
  }

  /** MJPEG-in-MP4: codec 'mjpa', the given JPEGs back-to-back in mdat,
    * sample tables pointing at their REAL byte ranges. Two-pass: the
    * header length is independent of the offset VALUES (fixed-width
    * be32 entries), so build once with zeros to measure, rebuild with
    * the true offsets. */
  private def mjpegMp4(jpegs: Seq[Array[Byte]]): Array[Byte] = {
    val body = jpegs.flatten.toArray
    def build(offsets: Seq[Int]) =
      mp4With("mjpa", jpegs.map(_.length), offsets, body)
    val probe = build(jpegs.map(_ => 0))
    val mdatBodyStart = probe.length - body.length
    build(jpegs.scanLeft(mdatBodyStart)(_ + _.length).init)
  }

  /** Deterministic real JPEG bytes: the synthetic pixel pattern for
    * `seed`, encoded by the in-JVM ImageIO JPEG writer. */
  private def testJpeg(seed: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, Multimodal.syntheticRgb(seed.toLong, x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Minimal EBML writer: id bytes verbatim + 8-byte-marker size. */
  private def ebml(idBytes: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    require(body.length < (1 << 21))
    // 3-byte size with the 0x20 marker: values up to 2^21-2
    val size = Array[Byte](
      (0x20 | (body.length >> 16)).toByte,
      ((body.length >> 8) & 0xff).toByte, (body.length & 0xff).toByte)
    idBytes ++ size ++ body
  }
  private def id(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray

  /** Hand-built minimal MKV: EBML header + Segment(Info(TimestampScale,
    * Duration), Tracks(TrackEntry(video, V_MPEG4/ISO/AVC, 1280×720)),
    * optional Cues(two CuePoints), two Clusters). */
  private def miniMkv(withCues: Boolean = false): Array[Byte] = {
    val header = ebml(id(0x1a, 0x45, 0xdf, 0xa3), Array[Byte]())
    val info = ebml(id(0x15, 0x49, 0xa9, 0x66),
      ebml(id(0x2a, 0xd7, 0xb1), be32(1000000).drop(1)), // 3-byte uint
      ebml(id(0x44, 0x89),
        java.nio.ByteBuffer.allocate(8).putDouble(1500.0).array()))
    val video = ebml(id(0xe0),
      ebml(id(0xb0), be16(1280)), ebml(id(0xba), be16(720)))
    val trackEntry = ebml(id(0xae),
      ebml(id(0x83), Array[Byte](1)), // TrackType video
      ebml(id(0x86), "V_MPEG4/ISO/AVC".getBytes("UTF-8")),
      video)
    val tracks = ebml(id(0x16, 0x54, 0xae, 0x6b), trackEntry)
    def cue(timeMs: Int, clusterPos: Int) = ebml(id(0xbb),
      ebml(id(0xb3), be16(timeMs)),
      ebml(id(0xb7), ebml(id(0xf1), be16(clusterPos))))
    val cues = ebml(id(0x1c, 0x53, 0xbb, 0x6b), cue(0, 100), cue(750, 200))
    val cluster1 = ebml(id(0x1f, 0x43, 0xb6, 0x75), Array.fill(4)(1.toByte))
    val cluster2 = ebml(id(0x1f, 0x43, 0xb6, 0x75), Array.fill(4)(2.toByte))
    val segment =
      if (withCues) ebml(id(0x18, 0x53, 0x80, 0x67),
        info, tracks, cues, cluster1, cluster2)
      else ebml(id(0x18, 0x53, 0x80, 0x67),
        info, tracks, cluster1, cluster2)
    header ++ segment
  }

  test("MP4 box parsing: dimensions, duration, codec, frame offsets") {
    import graft.operators.ContainerParse
    val m = ContainerParse.parseVideo(miniMp4()).get
    assert(m.container == "mp4" && m.codec == "avc1")
    assert(m.width == 640 && m.height == 360)
    assert(math.abs(m.durationSeconds - 2.5) < 1e-9)
    assert(m.nSamples == 3)
    assert(m.sampleOffsets == Seq(1000L, 2000L, 3000L))
  }

  test("MKV EBML parsing: dimensions, duration, codec, cluster offsets") {
    import graft.operators.ContainerParse
    val m = ContainerParse.parseVideo(miniMkv()).get
    assert(m.container == "mkv" && m.codec == "V_MPEG4/ISO/AVC")
    assert(m.width == 1280 && m.height == 720)
    assert(math.abs(m.durationSeconds - 1.5) < 1e-9)
    assert(m.nSamples == 0 && m.sampleOffsets.size == 2,
      s"expected two fallback cluster offsets, got ${m.sampleOffsets}")
  }

  test("MKV Cues parsing: the seek index wins over cluster fallback") {
    import graft.operators.ContainerParse
    val bytes = miniMkv(withCues = true)
    val m = ContainerParse.parseVideo(bytes).get
    // CueClusterPosition is Segment-relative; the writer's Segment
    // payload starts right after the EBML header (7 bytes) plus the
    // Segment id (4) + size (3)
    val segStart = (ebml(id(0x1a, 0x45, 0xdf, 0xa3),
      Array[Byte]()).length + 7).toLong
    assert(m.nSamples == 2, s"expected two cue points, got $m")
    assert(m.sampleOffsets == Seq(segStart + 100, segStart + 200),
      s"cues must rebase to absolute offsets: ${m.sampleOffsets}")
  }

  test("extractVideoMeta: batched Spark surface, nulls for junk") {
    import spark.implicits._
    val media = Seq(
      (1L, miniMp4()),
      (2L, miniMkv()),
      (3L, "not a video at all......".getBytes),
      (4L, null: Array[Byte]))
      .toDF("media_id", "payload")
    val out = Multimodal.extractVideoMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "mp4" && out(1L).getInt(3) == 640)
    assert(out(2L).getString(1) == "mkv" && out(2L).getInt(4) == 720)
    assert(out(3L).isNullAt(1) && out(4L).isNullAt(1),
      "junk/null payloads must survive as null-meta rows")
    // no exchange: pure partition-local projection
    val plan = Multimodal.extractVideoMeta(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }

  test("sampleFramesReal: exact byte ranges from the MP4 sample tables") {
    import spark.implicits._
    val media = Seq(
      (1L, miniMp4()),
      (2L, "junk".getBytes)).toDF("media_id", "payload")
    // fixture: 3 samples, sizes 100/120/80, chunk offsets 1000/2000/3000,
    // one sample per chunk — stride 2 keeps samples 0 and 2, exactly
    val out = Multimodal.sampleFramesReal(media, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set((1L, 0, 1000L, 100L), (1L, 2, 3000L, 80L)),
      s"bad ranges: $out")
  }

  test("MJPEG-in-MP4: real frame decode end-to-end, features " +
      "pixel-recomputed from the source JPEGs") {
    import spark.implicits._
    val jpegs = Seq(testJpeg(1), testJpeg(2), testJpeg(3))
    val good = mjpegMp4(jpegs)
    val m = graft.operators.ContainerParse.parseVideo(good).get
    assert(m.codec == "mjpa" && m.nSamples == 3 &&
      m.sampleOffsets.size == m.sampleSizes.size,
      s"fixture must parse with exact per-sample ranges: $m")
    // corrupt the MIDDLE frame only: SOI marker survives, innards
    // zeroed (same length, so the sample tables stay truthful)
    val corrupt = {
      val j1 = jpegs(1).clone()
      java.util.Arrays.fill(j1, 2, j1.length, 0.toByte)
      mjpegMp4(Seq(jpegs(0), j1, jpegs(2)))
    }
    val media = Seq(
      (1L, good),
      (2L, corrupt),
      (3L, miniMp4()),      // avc1: no in-JVM codec -> no rows
      (4L, "junk junk junk junk".getBytes)) // unparseable -> no rows
      .toDF("media_id", "payload")
    val out = Multimodal.extractFrameFeatures(media, stride = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    assert(out.keySet ==
      Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1), (2L, 2)),
      s"MJPEG rows only: ${out.keySet}")
    // pixel-recomputed oracle: each frame's features must equal the
    // image path's features over the SAME source JPEG bytes
    jpegs.zipWithIndex.foreach { case (j, i) =>
      val want = Multimodal.imageFeatures(Multimodal.decodeImage(j).get)
        .toSeq
      assert(out((1L, i)).getSeq[Float](2) == want, s"frame $i")
    }
    assert(out((1L, 0)).getSeq[Float](2) != out((1L, 1)).getSeq[Float](2),
      "distinct frames must yield distinct features — the decode is real")
    // the corrupt frame fails its row, not the payload: neighbors decode
    assert(out((2L, 1)).isNullAt(2), "undecodable frame -> NULL features")
    assert(!out((2L, 0)).isNullAt(2) && !out((2L, 2)).isNullAt(2))
    assert(out((2L, 0)).getSeq[Float](2) == out((1L, 0)).getSeq[Float](2))
    // stride applies to the sample index
    val strided = Multimodal.extractFrameFeatures(
      media.filter($"media_id" === 1L), stride = 2)
      .collect().map(_.getInt(1)).toSet
    assert(strided == Set(0, 2))
    // partition-local: no exchange
    val plan = Multimodal.extractFrameFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must not shuffle:\n$plan")
  }

  test("corrupt/truncated containers never throw") {
    import graft.operators.ContainerParse
    val good = miniMp4()
    // every prefix of a valid file parses to None or a sane result
    (0 until good.length by 7).foreach { n =>
      ContainerParse.parseVideo(good.take(n)) // must not throw
    }
    val goodMkv = miniMkv()
    (0 until goodMkv.length by 5).foreach { n =>
      ContainerParse.parseVideo(goodMkv.take(n))
    }
    // bit flips in headers
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      ContainerParse.parseVideo(b)
    }
  }

  /** Laced MKV: TrackEntry carries TrackNumber=1; two Clusters hold all
    * three lacing schemes plus a no-lacing SimpleBlock and an
    * interleaved other-track block. Each frame is filled with a
    * distinct byte so the parsed (offset, size) ranges are checked
    * value-for-value against the payload itself. */
  private def lacedMkv(): Array[Byte] = {
    val header = ebml(id(0x1a, 0x45, 0xdf, 0xa3), Array[Byte]())
    val info = ebml(id(0x15, 0x49, 0xa9, 0x66),
      ebml(id(0x2a, 0xd7, 0xb1), be32(1000000).drop(1)),
      ebml(id(0x44, 0x89),
        java.nio.ByteBuffer.allocate(8).putDouble(1500.0).array()))
    val video = ebml(id(0xe0),
      ebml(id(0xb0), be16(1280)), ebml(id(0xba), be16(720)))
    val trackEntry = ebml(id(0xae),
      ebml(id(0xd7), Array[Byte](1)), // TrackNumber = 1
      ebml(id(0x83), Array[Byte](1)),
      ebml(id(0x86), "V_MPEG4/ISO/AVC".getBytes("UTF-8")),
      video)
    val tracks = ebml(id(0x16, 0x54, 0xae, 0x6b), trackEntry)
    def fill(n: Int, c: Char) = Array.fill(n)(c.toByte)
    // header of a (Simple)Block body: track-1 vint, int16 ts, flags
    def blockHdr(track: Int, flags: Int) =
      Array((0x80 | track).toByte, 0.toByte, 0.toByte, flags.toByte)
    // no lacing: one 5-byte frame 'a'
    val sbPlain = ebml(id(0xa3), blockHdr(1, 0x80), fill(5, 'a'))
    // Xiph lacing, 3 frames: 3×'b', 300×'c' (coded 255+45), rest 7×'d'
    val sbXiph = ebml(id(0xa3), blockHdr(1, 0x80 | 0x02),
      Array(2.toByte, 3.toByte, 255.toByte, 45.toByte),
      fill(3, 'b'), fill(300, 'c'), fill(7, 'd'))
    // another track's block interleaves — must NOT contribute frames
    val sbOther = ebml(id(0xa3), blockHdr(2, 0x80), fill(9, 'z'))
    val cluster1 = ebml(id(0x1f, 0x43, 0xb6, 0x75),
      ebml(id(0xe7), Array[Byte](0)), sbPlain, sbXiph, sbOther)
    // EBML lacing inside a BlockGroup/Block, 3 frames: 4×'e' (vint
    // 0x84), +2 delta (signed 1-byte vint 0xC1 = 65 → 65-63 = +2) →
    // 6×'f', rest 5×'g'
    val blkEbml = ebml(id(0xa1), blockHdr(1, 0x06),
      Array(2.toByte, 0x84.toByte, 0xC1.toByte),
      fill(4, 'e'), fill(6, 'f'), fill(5, 'g'))
    // fixed-size lacing, 2 equal frames: 4×'h', 4×'i'
    val sbFixed = ebml(id(0xa3), blockHdr(1, 0x80 | 0x04),
      Array(1.toByte), fill(4, 'h'), fill(4, 'i'))
    val cluster2 = ebml(id(0x1f, 0x43, 0xb6, 0x75),
      ebml(id(0xe7), Array[Byte](1)),
      ebml(id(0xa0), blkEbml), sbFixed)
    header ++ ebml(id(0x18, 0x53, 0x80, 0x67),
      info, tracks, cluster1, cluster2)
  }

  test("MKV lacing-aware Block parsing: per-frame byte ranges, all " +
    "three lacing schemes, other-track blocks excluded") {
    import graft.operators.ContainerParse
    val bytes = lacedMkv()
    val m = ContainerParse.parseVideo(bytes).get
    assert(m.container == "mkv" && m.codec == "V_MPEG4/ISO/AVC")
    assert(m.width == 1280 && m.height == 720)
    // 9 video-track frames, sample-exact like MP4; the track-2 block
    // contributes nothing
    assert(m.nSamples == 9, s"expected 9 frames, got $m")
    assert(m.sampleSizes == Seq(5L, 3L, 300L, 7L, 4L, 6L, 5L, 4L, 4L),
      s"bad frame sizes: ${m.sampleSizes}")
    // every parsed range must cover exactly its distinct fill byte
    val expected = "abcdefghi"
    m.sampleOffsets.zip(m.sampleSizes).zipWithIndex.foreach {
      case ((off, len), i) =>
        val slice = bytes.slice(off.toInt, (off + len).toInt)
        assert(slice.length == len.toInt &&
          slice.forall(_ == expected(i).toByte),
          s"frame $i range ($off, $len) does not cover its fill bytes")
    }
    // sampleFramesReal now emits exact (offset, size) rows for MKV too
    import spark.implicits._
    val media = Seq((7L, bytes)).toDF("media_id", "payload")
    val rows = Multimodal.sampleFramesReal(media, stride = 4).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (0, m.sampleOffsets(0), 5L),
      (4, m.sampleOffsets(4), 4L),
      (8, m.sampleOffsets(8), 4L)), s"bad sampled rows: $rows")
    // truncation fuzz: no prefix of the laced file may throw
    (0 until bytes.length by 5).foreach { n =>
      ContainerParse.parseVideo(bytes.take(n))
    }
  }

  test("adversarial stsz sample counts fail the row, not the JVM") {
    import graft.operators.ContainerParse
    // a few-hundred-byte payload declaring ~Int.MaxValue UNIFORM samples
    // must parse to None — materializing the declared count would be a
    // multi-GB allocation, and OutOfMemoryError would kill the executor
    def mp4WithStsz(stszBody: Array[Byte]): Array[Byte] = {
      val base = miniMp4()
      // rebuild with the hostile stsz: simplest is to locate the benign
      // one (uniform=0, n=3) and splice a same-length replacement when
      // possible; otherwise rebuild the tree here
      val ftyp = box("ftyp", "isom".getBytes, be32(512),
        "isomiso2".getBytes)
      val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
        be32(0), be32(0), be32(1000), be32(2500),
        be32(0x00010000), be16(0x0100), be16(0), be32(0), be32(0),
        Array.fill(36)(0.toByte), Array.fill(24)(0.toByte), be32(2))
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
        be32(0), be32(0), be32(1), be32(0), be32(2500),
        Array.fill(8)(0.toByte), be16(0), be16(0), be16(0), be16(0),
        Array.fill(36)(0.toByte), be32(640 << 16), be32(360 << 16))
      val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
        "vide".getBytes, Array.fill(12)(0.toByte), Array[Byte](0))
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1),
        box("avc1", Array.fill(70)(0.toByte)))
      val stsz = box("stsz", Array[Byte](0, 0, 0, 0), stszBody)
      val stco = box("stco", Array[Byte](0, 0, 0, 0), be32(1), be32(1000))
      val stbl = box("stbl", stsd, stsz, stco)
      val moov = box("moov", mvhd,
        box("trak", tkhd, box("mdia", hdlr, box("minf", stbl))))
      require(base.nonEmpty) // keep the benign builder exercised
      ftyp ++ moov
    }
    // uniform sample size 100, declared count Int.MaxValue: parses in
    // O(1) memory (constant-value table) — a metadata-only moov may
    // legitimately declare more samples than its own byte length, so a
    // payload-size bound would be a correctness regression, and an
    // eager materialization a multi-GB allocation
    val hugeUniform =
      mp4WithStsz(be32(100) ++ be32(Int.MaxValue))
    val hugeMeta = ContainerParse.parseVideo(hugeUniform)
    assert(hugeMeta.exists(m => m.nSamples == Int.MaxValue &&
      m.sampleSizes.length == Int.MaxValue &&
      m.sampleSizes(123456789) == 100L))
    // rendering the meta must stay O(1): the default case-class/Seq
    // toString would drain all 2^31 elements — the latent DoS the
    // constant-size table exists to avoid
    val rendered = hugeMeta.get.toString
    assert(rendered.length < 200,
      s"VideoMeta toString must not materialize the tables: $rendered")
    assert(hugeMeta.get.sampleSizes.toString ==
      s"UniformSizes(${Int.MaxValue} x 100)")
    // metadata-only shape: more samples than the file has bytes
    val metadataOnly = mp4WithStsz(be32(100) ++ be32(10000))
    assert(ContainerParse.parseVideo(metadataOnly)
      .exists(m => m.nSamples == 10000 && m.sampleSizes(9999) == 100L))
    // non-uniform with a count far beyond the box's actual table must
    // still fail the row: the table physically cannot hold it
    val hostileTable =
      mp4WithStsz(be32(0) ++ be32(Int.MaxValue) ++ be32(100))
    assert(ContainerParse.parseVideo(hostileTable).isEmpty)
    // negative count
    val negative = mp4WithStsz(be32(100) ++ be32(-5))
    assert(ContainerParse.parseVideo(negative).isEmpty)
    // and a sane uniform-size file still parses
    val sane = mp4WithStsz(be32(100) ++ be32(3))
    val meta = ContainerParse.parseVideo(sane)
    assert(meta.exists(m => m.nSamples == 3 &&
      m.sampleSizes == Seq(100L, 100L, 100L)))
  }
}
