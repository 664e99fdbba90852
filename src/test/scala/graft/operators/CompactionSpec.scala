package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must shrink the file count to the byte-derived target
  * while preserving EXACTLY the table's rows — and the sort-preserving
  * variant must leave every output file internally ordered so min/max
  * pruning keeps working after the rewrite. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").toFile
      .getAbsolutePath + "/t"

  test("file count drops to the byte-derived target, rows identical") {
    val dir = freshDir()
    val docs = graft.table(spark, "/root/testdata/sf0.01", "documents")
    // simulate a streaming sink's litter: 64 tiny files
    docs.repartition(64).write.parquet(dir)
    val (bytes, before) = Compaction.stats(spark, dir)
    assert(before == 64)
    val original = spark.read.parquet(dir).collect().toSet

    val (b2, after) = Compaction.compact(spark, dir, targetBytes = bytes / 2)
    assert(b2 == 64)
    assert(after <= 3 && after >= 1, s"expected ~2 files, got $after")
    assert(spark.read.parquet(dir).collect().toSet == original)
  }

  test("preserveSortWithin leaves each output file internally sorted") {
    val dir = freshDir()
    graft.table(spark, "/root/testdata/sf0.01", "lineitem")
      .repartition(32).write.parquet(dir)
    val (bytes, _) = Compaction.stats(spark, dir)
    Compaction.compact(spark, dir, targetBytes = bytes / 3,
      preserveSortWithin = Seq("l_orderkey", "l_linenumber"))
    // per-FILE monotonicity of the sort key
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_orderkey"),
        monotonically_increasing_id().as("rowpos"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    assert(perFile.size >= 2)
    perFile.values.foreach { rows =>
      val keys = rows.sortBy(_._3).map(_._2)
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
        "a compacted file lost its internal sort")
    }
    // min/max ranges are what pruning reads: files should be disjoint-ish
    // only under a global sort — sortWithinPartitions promises per-file
    // order, which is what the assertion above pins.
  }

  test("zOrderBy compaction: small-files litter collapses to the target " +
      "AND the 2-d box pruning ratio survives the compaction cycle") {
    graft.functions.ZInterleave.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_zc").toFile
      .getAbsolutePath
    val dir = s"$root/t"
    val n = 200000
    def mk(lo: Int, hi: Int) = spark.range(lo, hi).select(
      (pmod(col("id") * 2654435761L, lit(1000000)) / 1000.0).as("x"),
      (pmod(col("id") * 40503L + 17, lit(1000000)) / 1000.0).as("y"))
    // a well-laid-out table (the ZOrderSpec shape)...
    ZOrder.write(mk(0, n), "x", "y", dir, nFiles = 64)
    // ...eroded by a stream of APPENDS: 24 unclustered litter files
    (0 until 8).foreach { i =>
      mk(n + i * 1000, n + (i + 1) * 1000)
        .repartition(3).write.mode("append").parquet(dir)
    }
    val (bytes, before) = Compaction.stats(spark, dir)
    assert(before == 64 + 24)
    val original = spark.read.parquet(dir).count()

    def filesTouched(): Long =
      spark.read.parquet(dir)
        .filter(col("x").between(400, 500) && col("y").between(400, 500))
        .select(input_file_name()).distinct().count()
    val erodedTouched = filesTouched()

    // Morton re-cluster at the byte-derived target (~the original 64)
    val (_, after) = Compaction.compact(spark, dir, bytes / 64,
      zOrderBy = Seq("x", "y"))
    assert(spark.read.parquet(dir).count() == original)
    assert(after <= 70 && after >= 32, s"unexpected file count $after")
    // the 10%×10% box touches O(sqrt(files)) again — the layout the
    // appends eroded is RESTORED by the same pass that fixed the file
    // count (every litter file overlapped the box before)
    val zTouched = filesTouched()
    assert(zTouched <= after / 4,
      s"z-compacted box touched $zTouched of $after files " +
        s"(eroded layout touched $erodedTouched of $before)")
    assert(erodedTouched >= 24,
      "litter files should all have overlapped the box pre-compaction")

    // both layout knobs at once is a contract error, not a silent pick
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir, bytes, preserveSortWithin = Seq("x"),
        zOrderBy = Seq("x", "y"))
    }
  }

  test("a second compaction is a no-op-sized rewrite (idempotent target)") {
    val dir = freshDir()
    graft.table(spark, "/root/testdata/sf0.01", "orders")
      .repartition(16).write.parquet(dir)
    val (bytes, _) = Compaction.stats(spark, dir)
    val (_, after1) = Compaction.compact(spark, dir, bytes)
    val (_, after2) = Compaction.compact(spark, dir, bytes)
    assert(after1 == 1 && after2 == 1)
  }
}
