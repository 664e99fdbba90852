package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Filesystem probes for the persistent streaming indexes, through the
  * HADOOP FileSystem of the path — `java.io.File` answers false for
  * every non-local URI (hdfs://, s3a://), which made the first
  * tombstone/prior-index probes silently see "nothing there" on
  * exactly the deployments the indexes are written for (takedowns
  * ignored, cross-batch dedup vanishing — wrong results, no error).
  * One shared home for the probe and the read-or-empty pattern so the
  * fix cannot fork per module.
  */
private[graft] object IndexFs {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Names of child directories of `path`; empty if absent. */
  def childDirs(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  def hasChildDirs(spark: SparkSession, path: String): Boolean =
    childDirs(spark, path).nonEmpty

  /** Read the parquet tree at `path`, or an empty frame with `schema`
    * when the path holds no data yet. */
  def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    if (!hasChildDirs(spark, path))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(path)

  /** Existence probe through the path's Hadoop FileSystem — the
    * replacement for every `java.io.File`/`java.nio.Files` probe. */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Read a small UTF-8 meta file (e.g. a `_PREFIXES` layout record);
    * None when absent. Meta files are tiny — read fully on the driver. */
  def readText(spark: SparkSession, path: String): Option[String] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Write a small UTF-8 meta file, creating parent dirs, overwriting
    * any prior content (single-writer meta, not a log). */
  def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new Path(path)
    val f = fs(spark, path)
    val out = f.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Names of ALL children of `path` (files and directories); empty if
    * absent. The file/dir split is the caller's business. */
  def listNames(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) Nil
    else f.listStatus(p).map(_.getPath.getName).toSeq
  }

  def mkdirs(spark: SparkSession, path: String): Unit =
    fs(spark, path).mkdirs(new Path(path))

  /** Modification time of `path` (file or directory), None when
    * absent — the age probe behind vacuum's retention horizon. */
  def modifiedAt(spark: SparkSession, path: String): Option[Long] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) None else Some(f.getFileStatus(p).getModificationTime)
  }

  /** Newest FILE mtime under `path`: the path's own when it is a
    * file, else the recursive max over contained files (falling back
    * to the directory's own status only when it holds no files).
    * None when absent. Vacuum's age gate stands on this instead of
    * [[modifiedAt]] because object-store connectors synthesize
    * directory statuses with mtime 0 — a directory's own mtime says
    * nothing about the age of what is inside it (Delta's per-file
    * vacuum pattern). */
  def newestModifiedAt(spark: SparkSession, path: String): Option[Long] = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) return None
    val st = f.getFileStatus(p)
    if (st.isFile) Some(st.getModificationTime)
    else {
      val it = f.listFiles(p, true)
      var newest = -1L
      while (it.hasNext)
        newest = math.max(newest, it.next().getModificationTime)
      if (newest >= 0) Some(newest) else Some(st.getModificationTime)
    }
  }

  /** Paths matching a Hadoop glob pattern (e.g. a `_p_day=&#42;` level
    * under each bucket root); empty when nothing matches — the
    * pre-check that lets path-pruned reads hand `spark.read` only
    * CONCRETE existing directories (a zero-match glob handed straight
    * to the reader throws instead of reading nothing). */
  def glob(spark: SparkSession, pattern: String): Seq[String] = {
    val matched = fs(spark, pattern).globStatus(new Path(pattern))
    if (matched == null) Nil else matched.toSeq.map(_.getPath.toString)
  }

  /** Idempotent single-file delete (through the FS, so checksum
    * siblings on LocalFileSystem go with it). */
  def delete(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new Path(path), false)

  def deleteRecursive(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new Path(path), true)

  /** EXCLUSIVE create-with-content: true iff THIS call created the
    * file — the rename-free commit primitive (a version-log entry's
    * successful exclusive create IS the commit; see
    * `cdc.ParquetTableStore`).
    *
    * VISIBILITY IS ATOMIC WITH CONTENT on every path that can make it
    * so: a reader never observes the file existing with partial (or
    * zero) bytes. This matters for commit-log arbitration — if a slot
    * could be seen mid-write, a concurrent writer from the same parent
    * would misread an in-flight commit as a torn corpse, skip over it,
    * and commit above it, silently shadowing the slower writer's merge
    * (a lost update both callers report as success).
    *
    *  - Local filesystems: content lands in a hidden temp file first,
    *    then publishes via `Files.createLink(dest, temp)` — link(2)
    *    is atomic and fails with EEXIST when the slot is taken, so
    *    arbitration survives and the dest only ever appears fully
    *    written. (Fallback for linkless filesystems: the java.nio
    *    `CREATE_NEW` direct write — the pre-fix residual.)
    *  - HDFS-like filesystems (atomic, non-overwriting rename):
    *    temp file + `rename(temp, dest)` — rename returns false when
    *    dest exists, and a crashed writer leaves only an invisible
    *    temp, never a torn slot.
    *  - Object stores: `create(path, overwrite = false)` — a
    *    conditional PUT is all-or-nothing at the object level (the
    *    object appears with its full body or not at all), so content
    *    atomicity is already the store's contract; check-then-act
    *    otherwise (the same residual Delta accepts on plain S3
    *    without a coordinating LogStore — and the commit loop's
    *    bounded torn-slot grace covers that window).
    */
  def createExclusive(spark: SparkSession, path: String,
      text: String): Boolean = {
    val f = fs(spark, path)
    val p = f.makeQualified(new Path(path))
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    f match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        val tmp = local.resolveSibling(
          s".${local.getFileName}.${java.util.UUID.randomUUID()}.tmp")
        try {
          java.nio.file.Files.write(tmp, bytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            java.nio.file.Files.createLink(local, tmp)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
            case _: UnsupportedOperationException =>
              // no hard links (exotic mounts): direct CREATE_NEW —
              // exclusive, but visibility precedes content (residual)
              try {
                java.nio.file.Files.write(local, bytes,
                  java.nio.file.StandardOpenOption.CREATE_NEW,
                  java.nio.file.StandardOpenOption.WRITE)
                true
              } catch {
                case _: java.nio.file.FileAlreadyExistsException => false
              }
          }
        } finally java.nio.file.Files.deleteIfExists(tmp)
      case _ if hasAtomicRename(f) =>
        val tmp = new Path(p.getParent,
          s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
        val out = f.create(tmp, true)
        try out.write(bytes) finally out.close()
        val won =
          try {
            val ok = f.rename(tmp, p)
            // a false rename with NO existing destination is a write
            // FAILURE (transient NN/FS condition), not a lost race —
            // folding it into the arbitration-loss path would make the
            // caller skip a sequence slot over a phantom winner.
            // Surface it as the retryable IOException it is (the guard
            // below only swallows the genuine destination-exists loss).
            if (!ok && !f.exists(p))
              throw new java.io.IOException(
                s"rename $tmp -> $p returned false with no existing " +
                  "destination — write failure, not a lost race")
            ok
          } catch { case _: java.io.IOException if f.exists(p) => false }
        if (!won) f.delete(tmp, false)
        won
      case _ =>
        try {
          val out = f.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if f.exists(p) => false
        }
    }
  }

  /** Whether this filesystem's rename is atomic AND refuses an
    * existing destination — the pair the temp+rename publish path
    * stands on. True for HDFS (and viewfs over it); object-store
    * connectors emulate rename as copy+delete and must keep the
    * conditional-put path instead. Decided by scheme, not class, so
    * no compile-time dependency on hadoop-hdfs. */
  private def hasAtomicRename(f: org.apache.hadoop.fs.FileSystem): Boolean =
    f.getScheme match {
      case "hdfs" | "viewfs" | "webhdfs" => true
      case _ => false
    }
}
