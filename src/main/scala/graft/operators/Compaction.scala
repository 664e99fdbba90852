package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB lake needs: streaming sinks and per-batch appends leave
  * thousands of KB-sized parquet files per partition, and scan
  * planning / task scheduling costs scale with FILE COUNT, not bytes
  * (one Spark task per file at the extreme; the reference's
  * row-at-a-time JDBC loop has the same pathology in table form).
  *
  * Policy: size the output file count from the table's actual on-disk
  * bytes (`targetBytes` per output file), never a hardcoded partition
  * count — `repartition(n)` with round-robin assignment yields
  * near-equal file sizes at any input skew. Callers compacting a
  * layout-sensitive table pass `preserveSortWithin` to re-establish a
  * per-file sort (cheap local sort, no exchange beyond the
  * repartition), keeping min/max pruning effective after the rewrite.
  * A table whose scans filter on TWO correlated dimensions passes
  * `zOrderBy` instead: the rewrite re-clusters on the Morton curve
  * (the ZOrder.writeN layout at the byte-derived file count, any arity), so the
  * maintenance pass that fixes the file-count pathology ALSO restores
  * the 2-d data-skipping a stream of appends erodes — file-level
  * min/max stats are tight on both dimensions after every cycle
  * (CompactionSpec measures the touched-file ratio surviving the
  * cycle). Round-robin compaction would do the opposite: it shuffles
  * rows arbitrarily, destroying whatever clustering the appends still
  * had.
  *
  * The rewrite goes through a sibling temp dir + atomic-ish rename
  * swap rather than `overwrite` on the live path, so a reader that
  * loses the race sees either the old file set or the new one, not a
  * half-deleted directory. (A real lakehouse uses a transactional
  * table format for this; the swap is the plain-parquet equivalent and
  * the spec covers the data-equality contract, not concurrent
  * readers.)
  */
object Compaction {

  /** On-disk bytes and file count of a parquet directory (recursive,
    * data files only). */
  def stats(spark: SparkSession, dir: String): (Long, Int) = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val files = walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    (files.map(_.length()).sum, files.size)
  }

  /** Rewrite `dir` into ~`targetBytes`-sized parquet files; returns
    * (filesBefore, filesAfter).
    *
    * LOCAL FILESYSTEM ONLY: the stats walk and the rename swap go
    * through `java.io.File`, so `dir` must be a local path — HDFS/S3
    * object stores have no atomic directory rename and need a
    * transactional table format instead. If the second rename of the
    * swap fails, the old file set is rolled back to the live path
    * before the error surfaces — a crash can strand a stale
    * `_compact_tmp`/`_compact_old` sibling (cleaned on the next run),
    * but the live path always holds a complete file set. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long,
      preserveSortWithin: Seq[String] = Nil,
      zOrderBy: Seq[String] = Nil): (Int, Int) = {
    require(zOrderBy.isEmpty || preserveSortWithin.isEmpty,
      "pass either zOrderBy (Morton re-cluster) or preserveSortWithin " +
        "(per-file sort), not both — they prescribe conflicting layouts")
    // fail FAST on a non-local path: the java.io walk below would see
    // an empty directory on hdfs://s3a:// and "compact" the table to
    // nothing was the failure mode; documented contract above. An
    // explicit file: scheme is accepted and NORMALIZED to its path —
    // java.io.File would otherwise treat "file:" as a literal relative
    // component, mis-size the rewrite (0 observed bytes → one output
    // file), and then fail the rename swap after the wasted rewrite
    // (the ParquetTableStore.localRoot treatment).
    val uri = new org.apache.hadoop.fs.Path(dir).toUri
    require(uri.getScheme == null || uri.getScheme == "file",
      s"Compaction.compact requires a local filesystem path (java.io " +
        s"walk + rename swap); got '$dir' — use a transactional table " +
        s"format's own compaction on object stores")
    val dir0 = if (uri.getScheme == "file") uri.getPath else dir
    return compactLocal(spark, dir0, targetBytes, preserveSortWithin, zOrderBy)
  }

  private def compactLocal(spark: SparkSession, dir: String,
      targetBytes: Long, preserveSortWithin: Seq[String],
      zOrderBy: Seq[String]): (Int, Int) = {
    val (bytes, before) = stats(spark, dir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    // the Morton re-cluster writes through ZOrder.write's own
    // range-partitioned layout into the temp dir, then swaps below —
    // one skew-aware sampled shuffle, the same cost class as the
    // round-robin repartition it replaces
    val rewritten =
      if (zOrderBy.nonEmpty) df // layout handled by ZOrder.writeN at the swap
      else {
        val rep = df.repartition(n)
        if (preserveSortWithin.nonEmpty)
          rep.sortWithinPartitions(preserveSortWithin.map(col): _*)
        else rep
      }
    val tmp = dir.stripSuffix("/") + "_compact_tmp"
    val old = dir.stripSuffix("/") + "_compact_old"
    if (zOrderBy.nonEmpty) ZOrder.writeN(rewritten, zOrderBy, tmp, n)
    else rewritten.write.mode("overwrite").parquet(tmp)
    val dirF = new java.io.File(dir); val tmpF = new java.io.File(tmp)
    val oldF = new java.io.File(old)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      f.delete(); ()
    }
    rm(oldF)
    require(dirF.renameTo(oldF), s"swap failed: $dir -> $old")
    if (!tmpF.renameTo(dirF)) {
      // restore the live path before surfacing the failure — the table
      // must never stay stranded at _compact_old
      val restored = oldF.renameTo(dirF)
      throw new IllegalStateException(s"swap failed: $tmp -> $dir" +
        (if (restored) " (old file set rolled back)"
         else s"; ROLLBACK ALSO FAILED — table is at $old"))
    }
    rm(oldF)
    val (_, after) = stats(spark, dir)
    (before, after)
  }
}
