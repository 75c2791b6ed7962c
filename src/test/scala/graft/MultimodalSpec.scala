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

  test("non-WAV bytes yield null audio features") {
    import spark.implicits._
    val junk = Seq((1L, "definitely not riff".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.extractAudioFeatures(junk).collect()
    assert(out.length == 1 && out(0).isNullAt(1))
  }
}
