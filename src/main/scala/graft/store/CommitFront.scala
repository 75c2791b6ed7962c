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

  /** True for the local-FS bindings (LocalFileSystem wraps RawLocal),
    * where BOTH hadoop primitives are unsafe under concurrency:
    * `rename` delegates to POSIX rename(2), which REPLACES an existing
    * destination (the exists-then-rename sequence is a TOCTOU race two
    * writers can both win, silently dropping one commit — found by the
    * N-writer OCC stress property), and `create(dst, overwrite=false)`
    * is exists-then-open, same race plus a torn-read window while the
    * body streams. POSIX's one atomic no-overwrite publish is
    * link(2) — hard-linking a fully-written temp file fails with
    * EEXIST atomically and makes the body visible whole. */
  private def isLocal(fs: FileSystem): Boolean =
    fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  /** Atomic no-overwrite publish of an already-written local `tmp` at
    * `dst` via hard link; tmp (and its checksum sidecar) are removed
    * either way. Returns false on EEXIST = lost the race. Paths are
    * qualified against the FILESYSTEM first — a relative Hadoop path
    * resolves against `fs.getWorkingDirectory`, not the JVM's CWD,
    * and `toUri.getPath` on the raw path would conflate the two. On
    * the rare local fs where link(2) is unsupported (some FUSE/SMB
    * mounts), degrade LOUDLY to the exclusive-create publish — a
    * narrowed race beats refusing to commit at all. */
  private def linkPublish(fs: FileSystem, dst: Path, tmp: Path): Boolean = {
    val t = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
    val d = java.nio.file.Paths.get(fs.makeQualified(dst).toUri.getPath)
    try {
      val won =
        try { java.nio.file.Files.createLink(d, t); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case e @ (_: UnsupportedOperationException |
                    _: java.nio.file.FileSystemException) =>
            // hard links unsupported here: fall back to the exclusive
            // create (CREATE_NEW is still open(O_CREAT|O_EXCL) —
            // atomic no-overwrite — but readers can see the body
            // mid-copy, unlike a link; warn so operators know the
            // torn-read window is open on this mount).
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"hard-link publish unsupported at $d (${e.getMessage})" +
                "; degrading to exclusive-create copy — concurrent " +
                "readers may observe a partially-written manifest")
            try {
              java.nio.file.Files.copy(t, d,
                java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
            }
        }
      if (won) {
        // carry the ChecksumFileSystem sidecar so later reads verify;
        // best-effort (a missing crc reads unverified, never wrong)
        val tCrc = t.resolveSibling("." + t.getFileName + ".crc")
        val dCrc = d.resolveSibling("." + d.getFileName + ".crc")
        if (java.nio.file.Files.exists(tCrc)) {
          try java.nio.file.Files.createLink(dCrc, tCrc)
          catch { case _: java.io.IOException => () }
        }
      }
      won
    } finally fs.delete(tmp, false)
  }

  object Rename extends CommitFront {
    override def publish(fs: FileSystem, dst: Path, tmp: Path,
        body: Array[Byte], beforeCommit: () => Unit): Boolean = {
      val out = fs.create(tmp, true)
      try out.write(body)
      finally out.close()
      beforeCommit()
      if (isLocal(fs)) return linkPublish(fs, dst, tmp)
      // HDFS/ABFS/GCS enforce no-overwrite rename SERVER-SIDE
      // (atomically); the exists() probe just spares the common lost
      // race an exception-shaped round trip.
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
      if (isLocal(fs)) {
        // Local EMULATION of the conditional PUT must match S3's
        // semantics — atomic, no-overwrite, never torn-readable — and
        // RawLocal's create(dst, overwrite=false) is none of those
        // (exists-then-open TOCTOU + readers see the body mid-stream).
        // A fully-written temp + hard link IS that semantics locally.
        val out = fs.create(tmp, true)
        try out.write(body)
        finally out.close()
        beforeCommit()
        return linkPublish(fs, dst, tmp)
      }
      beforeCommit()
      val out =
        try fs.create(dst, false) // the If-None-Match: * call
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
            return false
          case _: java.io.IOException if fs.exists(dst) =>
            // some connectors signal exclusive-create loss as a
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
