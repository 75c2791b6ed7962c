package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.types.StructType

/** Length-prefixed UnsafeRow blob files: the staging codec behind the
  * DSv2 streaming faces. Both ends of a stage are THIS repo (the same
  * session, the same fixed schema), so rows move as raw UnsafeRow bytes
  * — no parquet round-trip, no per-field conversion — and a reader is
  * `pointTo` over the blob.
  *
  * File format: repeated `[len: int4][bytes: len]`, terminated by
  * `len = -1`. A staged DIRECTORY commits via `_SUCCESS` after an
  * atomic rename, so a torn stage (crash mid-write) is invisible and
  * re-staged. Executor-side filesystem access carries the SESSION's
  * Hadoop configuration (via [[SerializableWritable]]) — a bare
  * `new Configuration()` would drop every `spark.hadoop.*` setting
  * (credentials, endpoints) on object-store deployments. */
private[graft] object RowBlobStage {

  val Success = "_SUCCESS"

  /** Winner-file manifest written into the staged dir BEFORE the
    * commit rename. [[stagedFiles]] serves only the names listed here:
    * a zombie task attempt can recreate its loser blob AFTER the
    * loser-shed pass but BEFORE the rename (the post-rename delete
    * only covers recreation after it), and a part-* listing would then
    * serve that partition's rows twice. The manifest pins the winner
    * set the driver actually collected. */
  val FilesManifest = "_files"

  /** The session's Hadoop conf, shippable to executor closures. */
  def confOf(spark: SparkSession): SerializableWritable[Configuration] =
    new SerializableWritable(spark.sparkContext.hadoopConfiguration)

  def isStaged(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, Success)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Stages `df`'s rows under `dir` (idempotent: an existing committed
    * stage is reused; a torn one is replaced). Executor tasks write one
    * blob file per non-empty partition into a temp dir; the driver
    * renames it over and marks `_SUCCESS`. */
  def stage(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(dirPath, Success))) return
    val tmp = new Path(dirPath.getParent,
      s".tmp-${dirPath.getName}-${java.util.UUID.randomUUID.toString.take(8)}")
    val tmpStr = tmp.toString
    val confW = confOf(spark)
    // ATTEMPT-UNIQUE blob names: a speculative or zombie task attempt
    // writing the same `part-$pid` path as the winner could interleave
    // bytes and commit a corrupt blob (the TableSink writer learned
    // this first — part-$partitionId-$taskId there). Each attempt owns
    // its file; collect() returns exactly ONE winner name per
    // partition, and only winner files survive into the committed dir.
    val written = df.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val name = s"part-$pid-a$attempt"
          val p = new Path(s"$tmpStr/$name")
          val pfs = p.getFileSystem(confW.value)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(pfs.create(p, true), 1 << 16))
          try {
            it.foreach { r =>
              val b = r.asInstanceOf[UnsafeRow].getBytes
              out.writeInt(b.length)
              out.write(b)
            }
            out.writeInt(-1)
          } finally out.close()
          Iterator.single(name)
        }
      }.collect() // winner file names only — never row data
    if (fs.exists(dirPath)) fs.delete(dirPath, true) // torn predecessor
    fs.mkdirs(dirPath.getParent)
    if (!fs.exists(tmp)) fs.mkdirs(tmp) // all-empty-partition stage
    else {
      // shed loser-attempt files so the committed dir carries exactly
      // the winners (stagedFiles lists every part-*)
      val keep = written.toSet
      fs.listStatus(tmp).foreach { s =>
        if (!keep(s.getPath.getName) &&
            s.getPath.getName.startsWith("part-"))
          fs.delete(s.getPath, false)
      }
    }
    // the winner manifest rides INSIDE the renamed dir, so its content
    // and the commit are one atomic unit
    val mf = fs.create(new Path(tmp, FilesManifest), true)
    try mf.write(written.sorted.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally mf.close()
    if (!fs.rename(tmp, dirPath) && !fs.exists(new Path(dirPath, Success)))
      throw new java.io.IOException(s"failed to commit stage $dir")
    fs.create(new Path(dirPath, Success), true).close()
    fs.delete(tmp, true) // a zombie may have recreated it post-shed
  }

  def stagedFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else {
      // serve exactly the winner set the committing driver collected —
      // a part-* listing could include a zombie attempt's blob
      // recreated between the loser-shed pass and the rename
      val mfPath = new Path(p, FilesManifest)
      if (fs.exists(mfPath)) {
        val in = fs.open(mfPath)
        val names =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        names.split("\n").toSeq.filter(_.nonEmpty)
          .map(n => new Path(p, n).toString)
      } else fs.listStatus(p).toSeq // pre-manifest stage (older layout)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString)
    }
  }

  def drop(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** UnsafeRow iterator over one blob file, CLOSEABLE: the stream
    * self-closes at the terminator, and `close()` covers readers that
    * stop early (a limit, a cancelled task) — leaking the handle per
    * abandoned partition would exhaust file descriptors on a
    * long-running stream. */
  final class BlobRows(path: String, numFields: Int, conf: Configuration)
      extends Iterator[UnsafeRow] with AutoCloseable {
    private val p = new Path(path)
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(p.getFileSystem(conf).open(p),
        1 << 16))
    private var open = true
    private var nextLen = in.readInt()
    if (nextLen < 0) close()

    override def close(): Unit = if (open) { open = false; in.close() }
    override def hasNext: Boolean = nextLen >= 0
    override def next(): UnsafeRow = {
      val b = new Array[Byte](nextLen)
      in.readFully(b)
      val row = new UnsafeRow(numFields)
      row.pointTo(b, nextLen)
      nextLen = in.readInt()
      if (nextLen < 0) close()
      row
    }
  }

  def readUnsafe(
      path: String, numFields: Int, conf: Configuration): BlobRows =
    new BlobRows(path, numFields, conf)

  /** External-Row variant (for `spark.createDataFrame` reconstruction —
    * public API, no internal frame constructors). Reads to EOF, so the
    * stream self-closes. */
  def readRows(
      path: String, schema: StructType, conf: Configuration): Iterator[Row] = {
    val conv = CatalystTypeConverters.createToScalaConverter(schema)
    val rows = readUnsafe(path, schema.size, conf)
    // a killed task / early-terminated consumer abandons the iterator
    // before its EOF self-close — hook the task completion so the
    // handle can never outlive the task (the CDC reader path gets the
    // same guarantee from PartitionReader.close)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => rows.close()))
    rows.map(u => conv(u).asInstanceOf[Row])
  }
}
