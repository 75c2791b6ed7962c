package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads are opaque BINARY columns
  * with a typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched partition-local transforms.
  *
  * The image/audio codec libraries are not available in this environment,
  * so the byte-level decode is a clearly-marked deterministic STUB
  * ([[stubDecode]]) — everything around it (schema, batch shape,
  * partitioning, the mapPartitions plumbing a real decoder would drop
  * into) is real and tested. Swap [[stubDecode]] for an actual codec call
  * to productionize.
  */
object Multimodal {

  /** Canonical media row schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  val featureDim = 16

  /** STUB decoder: a real implementation would call an image/audio codec
    * here. This deterministic fake derives `featureDim` pseudo-features
    * from byte content (FNV over strided byte windows) so tests can assert
    * exact plumbing behavior end-to-end. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload == null) return out
    var i = 0
    while (i < featureDim) {
      var h = 0xcbf29ce484222325L ^ i
      var j = i
      while (j < payload.length) {
        h ^= (payload(j) & 0xffL)
        h *= 0x100000001b3L
        j += featureDim
      }
      out(i) = ((h % 1000L).toFloat) / 1000.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: partition-local, processing rows in
    * micro-batches of `batchSize` (the shape a vectorized decoder — GPU or
    * SIMD — wants). Input must have media_id + payload columns. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val encoder = Encoders.row(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // A real decoder would decode the whole batch in one call here.
        batch.map { r =>
          val features = stubDecode(r.getAs[Array[Byte]](payloadIdx))
          Row(r.getLong(idIdx), features.toSeq)
        }
      }
    }(encoder)
  }

  /** Resize plumbing: recompute metadata for a target size; payload passes
    * through untouched (the stub for the codec's resample call). Pure
    * column expressions — no data movement. */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.format").as("format"),
        lit(w).as("width"),
        lit(h).as("height"),
        col("meta.n_frames").as("n_frames")))

  /** Frame sampling: emit every `stride`-th frame index with a byte-range
    * into the payload (the access pattern a real container demuxer
    * produces), assuming fixed-size frames payload_len / n_frames. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val n = coalesce(col("meta.n_frames"), lit(0))
    val frameLen = when(n > 0,
      floor(length(col("payload")).cast(LongType) / n).cast(LongType))
      .otherwise(lit(0L))
    media
      .select(
        col("media_id"),
        frameLen.as("frame_len"),
        explode_outer(
          when(n > 0, sequence(lit(0), n - 1, lit(stride)))
            .otherwise(array().cast(ArrayType(IntegerType))))
          .as("frame_idx"))
      .select(
        col("media_id"),
        col("frame_idx"),
        (col("frame_idx") * col("frame_len")).as("byte_offset"),
        col("frame_len").as("byte_len"))
  }

  /** Deterministic synthetic media table for specs/demo: payload bytes are
    * derived from the id, metadata marks them as tiny fake videos. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      // 64 deterministic payload bytes per row (4 × 16-byte md5 blocks)
      concat((0 until 4).map(b =>
        unhex(md5(concat(col("id").cast(StringType), lit(s"-$b"))))): _*)
        .as("payload"),
      struct(
        lit("fakevid").as("format"),
        lit(8).as("width"),
        lit(8).as("height"),
        lit(4).as("n_frames")).as("meta"))
  }
}
