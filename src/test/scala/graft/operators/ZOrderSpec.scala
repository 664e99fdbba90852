package graft.operators

import graft.TestSpark
import graft.functions.ZInterleave
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton interleave arithmetic + the data-skipping property the
  * Z-order layout exists for. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("z_interleave spreads and interleaves bits exactly") {
    // reference: per-bit reconstruction
    def slow(a: Int, b: Int): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a.toLong >> i) & 1L) << (2 * i + 1)
        z |= ((b.toLong >> i) & 1L) << (2 * i)
      }
      z
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF),
      (12345, 54321), (Int.MaxValue, 7), (1 << 30, 1 << 15))
    cases.foreach { case (a, b) =>
      assert(ZInterleave.interleave(a, b) === slow(a, b), s"($a, $b)")
    }
    // z-order preserves the "both dims small => z small" containment
    assert(ZInterleave.interleave(3, 3) < ZInterleave.interleave(4, 0))
  }

  test("codegen and eval paths agree") {
    ZInterleave.register(spark)
    // non-negative ids only — the function's declared domain
    val df = (0 until 1000).map(i =>
      ((i * 2654435761L.toInt) & Int.MaxValue, (i * 40503) & Int.MaxValue))
      .toDF("a", "b")
    val viaExpr = df.select(expr("z_interleave(a, b)").as("z"))
      .as[Long].collect()
    val viaScala = df.as[(Int, Int)].collect()
      .map { case (a, b) => ZInterleave.interleave(a, b) }
    assert(viaExpr.toSeq === viaScala.toSeq)
  }

  test("negative bucket ids are rejected, not silently mis-sorted") {
    // a negative id would set bit 63 and invert the signed z-order —
    // the layout's one guarantee — so it must fail loudly (r4 advice)
    val e = intercept[IllegalArgumentException](ZInterleave.interleave(-1, 0))
    assert(e.getMessage.contains("non-negative"))
    assert(ZInterleave.interleave(Int.MaxValue, Int.MaxValue) > 0L,
      "max in-domain ids must still produce a positive z-value")
  }

  test("z-ordered layout prunes 2-d box scans that a 1-d sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 200000
    // two independent uniform dims — the adversarial case for 1-d sorts
    val df = spark.range(n).select(
      (pmod(col("id") * 2654435761L, lit(1000000)) / 1000.0).as("x"),
      (pmod(col("id") * 40503L + 17, lit(1000000)) / 1000.0).as("y"))
    val nFiles = 64
    ZOrder.write(df, "x", "y", s"$dir/z", nFiles)
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // a 10% × 10% box: count files that contain any matching row — the
    // proxy for file-level min/max skipping (parquet stats prune the
    // same way).
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x").between(400, 500) && col("y").between(400, 500))
        .select(input_file_name()).distinct().count()

    val zTouched = filesTouched(s"$dir/z")
    val linTouched = filesTouched(s"$dir/linear")
    // 1-d sort: x-range hits ~10% of files, but each of those files
    // spans ALL of y, so nothing else prunes (~6-7 files here and every
    // one is a full x-stripe). z-order: the box touches O(sqrt(files)).
    assert(zTouched <= nFiles / 4, s"z-order touched $zTouched of $nFiles")
    // and z-ordering must genuinely beat restricting only x
    assert(zTouched < linTouched,
      s"z-order ($zTouched files) did not beat linear ($linTouched)")
    info(s"10%x10% box on $nFiles files: z-order touches $zTouched, " +
      s"x-sorted touches $linTouched (pruning ratio ${
        linTouched.toDouble / zTouched}x)")
    // same rows either way — layout changes locality, not content
    val a = spark.read.parquet(s"$dir/z")
      .filter(col("x").between(400, 500) && col("y").between(400, 500)).count()
    val b = spark.read.parquet(s"$dir/linear")
      .filter(col("x").between(400, 500) && col("y").between(400, 500)).count()
    assert(a === b)
  }
}
