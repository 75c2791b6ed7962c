package graft.sources

import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source + writer (the row-major lake format next
  * to the ORC/parquet columnar pair — Kafka archives, Sqoop-era lakes
  * and schema-registry pipelines all ship it). Spark's avro DataSource
  * is a separate artifact not present in this deployment, but the Avro
  * CORE library is — so graft reads the container format directly,
  * with the scale mechanics the built-in source would have:
  *
  *  - **Splittable within a file.** An Avro container is a header plus
  *    sync-marker-delimited blocks; a reader can enter at any byte
  *    offset by scanning to the next marker. Files are cut into
  *    `spark.sql.files.maxPartitionBytes` ranges and each task does
  *    exactly the avro-mapred dance: `sync(start)`, read while
  *    `!pastSync(end)` — so ONE 10 GB file fans out across the
  *    cluster instead of pinning one task (`AvroSpec` proves a
  *    multi-split read returns every row exactly once).
  *  - **Column pruning at decode.** The pinned read schema becomes the
  *    Avro READER schema, so schema resolution skips non-requested
  *    fields during decode (Avro is row-major: bytes are still read,
  *    but no values are materialized — the format's ceiling, the same
  *    one spark-avro has). Predicate pushdown does not exist for Avro
  *    anywhere; filters apply post-decode in codegen.
  *  - **No inference.** Like [[Sources.jsonl]]/[[Sources.orc]], the
  *    schema is EXPLICIT: inference would scan the data twice and
  *    drift as records evolve. Avro schema resolution handles the
  *    rest (int→long promotion, writer-side extra fields, reader-side
  *    missing-field defaults).
  *
  * `_line` is best-effort iteration order via [[Sources.table]] — an
  * Avro block carries no stable physical line identity the way the CSV
  * byte-offset index does (same documented boundary as ORC). */
object Avro {

  // ---------------------------------------------------------------- write

  /** Spark schema → Avro schema. Nullable fields become the standard
    * `union[null, T]` with a null default; dates/timestamps carry
    * their Avro logical types (`date` int days, `timestamp-micros`
    * long) so foreign readers interpret them correctly. Unsupported
    * Spark types refuse loudly at plan time, never mid-job. */
  private[sources] def avroSchema(st: StructType, name: String): ASchema = {
    val rec = ASchema.createRecord(name, null, "graft.avro", false)
    val fields = new java.util.ArrayList[ASchema.Field](st.size)
    st.fields.foreach { f =>
      val base = avroType(f.dataType, s"${name}_${f.name}")
      val (sch, default) =
        if (f.nullable)
          (ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base),
            ASchema.Field.NULL_DEFAULT_VALUE)
        else (base, null)
      fields.add(new ASchema.Field(f.name, sch, null, default))
    }
    rec.setFields(fields)
    rec
  }

  private def avroType(dt: DataType, path: String): ASchema = dt match {
    case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType =>
      ASchema.create(ASchema.Type.INT)
    case LongType => ASchema.create(ASchema.Type.LONG)
    case FloatType => ASchema.create(ASchema.Type.FLOAT)
    case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
    case StringType => ASchema.create(ASchema.Type.STRING)
    case BinaryType => ASchema.create(ASchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
    case st: StructType => avroSchema(st, path)
    case ArrayType(et, containsNull) =>
      val el = avroType(et, s"${path}_item")
      ASchema.createArray(
        if (containsNull)
          ASchema.createUnion(ASchema.create(ASchema.Type.NULL), el)
        else el)
    case MapType(StringType, vt, vn) =>
      val v = avroType(vt, s"${path}_value")
      ASchema.createMap(
        if (vn) ASchema.createUnion(ASchema.create(ASchema.Type.NULL), v)
        else v)
    case other =>
      throw new IllegalArgumentException(
        s"Avro source does not support Spark type ${other.sql} (at $path)")
  }

  /** External Spark value → Avro generic value, against the TARGET
    * Spark type (the single source of truth for both directions). */
  private def toAvro(v: Any, dt: DataType, sch: ASchema): Any = {
    if (v == null) return null
    val s = nonNull(sch)
    dt match {
      case _: StructType =>
        rowToRecord(v.asInstanceOf[Row], dt.asInstanceOf[StructType], s)
      case ArrayType(et, _) =>
        val in = v.asInstanceOf[scala.collection.Seq[Any]]
        val out = new java.util.ArrayList[Any](in.size)
        in.foreach(x => out.add(toAvro(x, et, s.getElementType)))
        out
      case MapType(_, vt, _) =>
        val in = v.asInstanceOf[scala.collection.Map[String, Any]]
        val out = new java.util.HashMap[String, Any](in.size)
        in.foreach { case (k, x) =>
          out.put(k, toAvro(x, vt, s.getValueType)) }
        out
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val t = v.asInstanceOf[java.sql.Timestamp]
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case _ => v // primitives and strings pass through
    }
  }

  private def nonNull(s: ASchema): ASchema =
    if (s.getType == ASchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
    else s

  private implicit class JListOps[A](l: java.util.List[A]) {
    def asScala: scala.collection.Seq[A] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[A]
      val it = l.iterator()
      while (it.hasNext) b += it.next()
      b
    }
  }

  private def rowToRecord(
      r: Row, st: StructType, sch: ASchema): GenericRecord = {
    val rec = new GenericData.Record(sch)
    var i = 0
    while (i < st.size) {
      val f = sch.getFields.get(i)
      rec.put(i, toAvro(r.get(i), st.fields(i).dataType, f.schema()))
      i += 1
    }
    rec
  }

  /** Writes `df` as Avro container files under `path` with the staged
    * commit discipline the blob stage uses (attempt-unique part names,
    * tmp dir + rename, `_SUCCESS`): a speculative or zombie attempt
    * can never interleave bytes with the winner's file, and a torn
    * write is invisible. One file per non-empty partition. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val st = df.schema
    val schemaJson = avroSchema(st, "graft_record").toString
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dirPath.getParent,
      s".tmp-${dirPath.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
    val tmpStr = tmp.toString
    val confW = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val written = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val name = s"part-$pid-a$attempt.avro"
        val p = new Path(s"$tmpStr/$name")
        val pfs = p.getFileSystem(confW.value)
        val sch = new ASchema.Parser().parse(schemaJson)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        val out = pfs.create(p, true)
        w.create(sch, out)
        try it.foreach(r => w.append(rowToRecord(r, st, sch)))
        finally w.close() // closes `out` too
        Iterator.single(name)
      }
    }.collect() // winner names only — never row data
    if (fs.exists(dirPath)) fs.delete(dirPath, true)
    fs.mkdirs(dirPath.getParent)
    if (!fs.exists(tmp)) fs.mkdirs(tmp)
    else {
      val keep = written.toSet
      fs.listStatus(tmp).foreach { s =>
        if (!keep(s.getPath.getName)) fs.delete(s.getPath, false)
      }
    }
    if (!fs.rename(tmp, dirPath) &&
        !fs.exists(new Path(dirPath, "_SUCCESS")))
      throw new java.io.IOException(s"failed to commit avro dir $path")
    fs.create(new Path(dirPath, "_SUCCESS"), true).close()
    fs.delete(tmp, true)
  }

  // ----------------------------------------------------------------- read

  /** Hadoop stream as Avro's random-access input. */
  private final class FsSeekable(
      in: org.apache.hadoop.fs.FSDataInputStream, len: Long)
      extends SeekableInput {
    override def seek(p: Long): Unit = in.seek(p)
    override def tell(): Long = in.getPos
    override def length(): Long = len
    override def read(b: Array[Byte], off: Int, n: Int): Int =
      in.read(b, off, n)
    override def close(): Unit = in.close()
  }

  /** Avro generic value → external Spark value against the TARGET
    * Spark type. Logical types arrive as their raw encodings (int
    * days / long micros) — the target type decides the conversion. */
  private def fromAvro(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.map(f =>
          fromAvro(rec.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.toSeq
          .map(fromAvro(_, et))
      case MapType(_, vt, _) =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]]
        val b = scala.collection.mutable.Map.empty[String, Any]
        m.forEach((k, x) => b.put(k.toString, fromAvro(x, vt)))
        b.toMap
      case StringType => v.toString // Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val b = new Array[Byte](bb.remaining())
        bb.duplicate().get(b)
        b
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case LongType => v.asInstanceOf[Number].longValue() // int→long promo
      case DoubleType => v.asInstanceOf[Number].doubleValue()
      case _ => v
    }
  }

  /** Reads Avro container files under `path` with `schema` as the
    * READER schema (fields it omits are skipped at decode; fields the
    * writer lacks resolve to their null default when nullable). Splits
    * each file at `spark.sql.files.maxPartitionBytes` boundaries. */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files =
      if (!fs.exists(p)) Array.empty[(String, Long)]
      else {
        val base = fs.getFileStatus(p)
        val stats =
          if (base.isDirectory) fs.listStatus(p) else Array(base)
        stats.filter(s => s.isFile && !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
          .map(s => (s.getPath.toString, s.getLen))
      }
    val maxSplit = math.max(1L << 20,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val splits = files.toSeq.flatMap { case (f, len) =>
      (0L until math.max(1L, len) by maxSplit)
        .map(s => (f, s, math.min(s + maxSplit, len)))
    }
    val readerJson = avroSchema(schema, "graft_record").toString
    val confW = new SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val targetFields = schema // serializable
    val rdd =
      if (splits.isEmpty)
        spark.sparkContext.emptyRDD[Row]
      else spark.sparkContext
        .parallelize(splits, splits.size)
        .flatMap { case (file, start, end) =>
          val reader = {
            val fp = new Path(file)
            val pfs = fp.getFileSystem(confW.value)
            val len = pfs.getFileStatus(fp).getLen
            val rs = new ASchema.Parser().parse(readerJson)
            new DataFileReader[GenericRecord](
              new FsSeekable(pfs.open(fp), len),
              new GenericDatumReader[GenericRecord](null, rs))
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ =>
              scala.util.Try(reader.close())))
          // the avro-mapred split dance: enter at the first sync point
          // past `start`, stop once the reader crosses `end` — every
          // block lands in exactly one split
          reader.sync(start)
          new Iterator[Row] {
            // memoized exhaustion: hasNext after false must stay false
            // (and must not probe the now-closed reader again)
            private var done = false
            override def hasNext: Boolean = {
              if (done) return false
              val h = reader.hasNext && !reader.pastSync(end)
              if (!h) { scala.util.Try(reader.close()); done = true }
              h
            }
            override def next(): Row =
              fromAvro(reader.next(), targetFields).asInstanceOf[Row]
          }
        }
    spark.createDataFrame(rdd, schema)
  }
}
