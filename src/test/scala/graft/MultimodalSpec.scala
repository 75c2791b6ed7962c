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
}
