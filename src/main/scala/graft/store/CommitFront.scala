package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** The manifest PUBLISH primitive — the one operation the table's OCC
  * protocol needs from a store: "make these bytes visible at `dst`
  * iff nothing is there yet, atomically". Everything else in the
  * commit path (attempt-unique data directories, loser cleanup,
  * retry-against-new-state) is store-agnostic.
  *
  * Two implementations, selected per session by
  * `spark.graft.commitFront`:
  *
  *   - `rename` (default): write a temp file, then a NO-OVERWRITE
  *     rename to `dst`. Atomic exactly where the filesystem's rename
  *     is (HDFS, ABFS, GCS, POSIX) — the Delta/Iceberg discipline.
  *   - `conditional-put`: ONE create-if-absent call carrying the whole
  *     body — the shape of S3's conditional PUT (`If-None-Match: *`,
  *     GA since 2024), which raw S3 serves atomically where its rename
  *     is a non-atomic copy+delete. Over a Hadoop FileSystem this
  *     binds to `create(dst, overwrite = false)`; the S3A connector
  *     translates exactly that into the conditional PUT when
  *     `fs.s3a.create.conditional.enabled` is set (hadoop-aws 3.4.1+),
  *     so the same call is the real thing on S3 and an exclusive
  *     create everywhere else. The caveat this front carries: the
  *     atomicity unit is the STORE's single-object write — on object
  *     stores that is the whole PUT (a crashed writer publishes
  *     nothing), while on plain HDFS/POSIX a writer crashing between
  *     create and close could leave a torn `dst`, which is why rename
  *     stays the default off object stores.
  *
  * Losing a race surfaces as `publish` → false; callers re-read the
  * winner's state and retry — no front ever overwrites a committed
  * manifest. */
private[graft] sealed trait CommitFront {
  /** Publish `body` at `dst` iff absent. `tmp` is the front's scratch
    * path (attempt-unique; unused by conditional-put). `beforeCommit`
    * fires immediately before the atomic operation — the OCC test
    * seam. Returns false when `dst` already exists (lost the race). */
  def publish(fs: FileSystem, dst: Path, tmp: Path, body: Array[Byte],
      beforeCommit: () => Unit): Boolean
}

private[graft] object CommitFront {

  /** `spark.graft.commitFront` → the front. Unset/`rename` → Rename;
    * `conditional-put` → ConditionalPut; anything else is a config
    * error, refused loudly (a typo silently falling back to rename on
    * raw S3 would un-fix exactly what the setting is for). */
  def of(spark: org.apache.spark.sql.SparkSession): CommitFront =
    spark.conf.getOption("spark.graft.commitFront")
      .getOrElse("rename") match {
      case "rename" => Rename
      case "conditional-put" => ConditionalPut
      case other => throw new IllegalArgumentException(
        s"spark.graft.commitFront must be 'rename' or " +
          s"'conditional-put', got '$other'")
    }

  object Rename extends CommitFront {
    override def publish(fs: FileSystem, dst: Path, tmp: Path,
        body: Array[Byte], beforeCommit: () => Unit): Boolean = {
      val out = fs.create(tmp, true)
      try out.write(body)
      finally out.close()
      beforeCommit()
      if (fs.exists(dst)) { fs.delete(tmp, false); false }
      else if (fs.rename(tmp, dst)) true
      else {
        fs.delete(tmp, false)
        if (fs.exists(dst)) false // lost the rename race itself
        else throw new java.io.IOException(
          s"failed to commit manifest $dst")
      }
    }
  }

  object ConditionalPut extends CommitFront {
    override def publish(fs: FileSystem, dst: Path, tmp: Path,
        body: Array[Byte], beforeCommit: () => Unit): Boolean = {
      beforeCommit()
      val out =
        try fs.create(dst, false) // the If-None-Match: * call
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            return false
          case _: java.io.IOException if fs.exists(dst) =>
            // RawLocalFileSystem signals exclusive-create loss as a
            // plain IOException; treat it as the lost race it is
            return false
        }
      var committed = false
      try {
        out.write(body)
        out.close()
        committed = true
        true
      } finally
        // a failed write must not leave a torn manifest behind on
        // stores where create+write is not one atomic unit
        if (!committed) {
          try out.close() catch { case _: Throwable => () }
          try fs.delete(dst, false) catch { case _: Throwable => () }
        }
    }
  }
}
