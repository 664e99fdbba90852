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

  test("z_interleave_n: per-bit reference at n=3, bit-identical to " +
      "z_interleave at n=2, out-of-budget ids rejected, codegen==eval") {
    def slowN(vals: Seq[Int]): Long = {
      val n = vals.size; val bits = 63 / n
      var z = 0L
      for (j <- vals.indices; i <- 0 until bits)
        z |= ((vals(j).toLong >> i) & 1L) << (i * n + (n - 1 - j))
      z
    }
    val cases3 = Seq(Seq(0, 0, 0), Seq(1, 2, 3), Seq(12345, 54321, 999),
      Seq((1 << 21) - 1, 0, (1 << 21) - 1), Seq(7, (1 << 20), 13))
    cases3.foreach { c =>
      assert(ZInterleave.interleaveN(c.toArray) === slowN(c), s"$c")
    }
    // containment: all dims small => z smaller than any dim large
    assert(ZInterleave.interleaveN(Array(3, 3, 3)) <
      ZInterleave.interleaveN(Array(4, 0, 0)))
    // n=2 agrees with the binary interleave on the shared domain
    Seq((0, 0), (12345, 54321), ((1 << 30) - 1, 7)).foreach { case (a, b) =>
      assert(ZInterleave.interleaveN(Array(a, b)) ===
        ZInterleave.interleave(a, b), s"($a, $b)")
    }
    // budget: n=3 caps each dim at 2^21
    val e = intercept[IllegalArgumentException](
      ZInterleave.interleaveN(Array(1 << 21, 0, 0)))
    assert(e.getMessage.contains("outside"))
    intercept[IllegalArgumentException](
      ZInterleave.interleaveN(Array(-1, 0, 0)))
    // codegen path == scala path
    ZInterleave.register(spark)
    val df = (0 until 500).map(i => (i * 7919 % 100000,
      i * 104729 % 100000, i * 1299709 % 100000)).toDF("a", "b", "c")
    val viaExpr = df.select(expr("z_interleave_n(a, b, c)").as("z"))
      .as[Long].collect()
    val viaScala = df.as[(Int, Int, Int)].collect()
      .map { case (a, b, c) => ZInterleave.interleaveN(Array(a, b, c)) }
    assert(viaExpr.toSeq === viaScala.toSeq)
  }

  test("3-d z-ordered layout prunes 3-d box scans that a 1-d sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    val n = 200000
    val df = spark.range(n).select(
      (pmod(col("id") * 2654435761L, lit(1000000)) / 1000.0).as("x"),
      (pmod(col("id") * 40503L + 17, lit(1000000)) / 1000.0).as("y"),
      (pmod(col("id") * 7919L + 3, lit(1000000)) / 1000.0).as("s"))
    val nFiles = 64
    ZOrder.writeN(df, Seq("x", "y", "s"), s"$dir/z", nFiles)
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    // a 20%^3 box — the (date, key, source) fact-scan shape
    def pred = col("x").between(400, 600) && col("y").between(400, 600) &&
      col("s").between(400, 600)
    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    val zTouched = filesTouched(s"$dir/z")
    val linTouched = filesTouched(s"$dir/linear")
    assert(zTouched < linTouched,
      s"3-d z-order ($zTouched files) did not beat linear ($linTouched)")
    assert(zTouched <= nFiles / 2, s"3-d z-order touched $zTouched of $nFiles")
    info(s"20%^3 box on $nFiles files: 3-d z-order touches $zTouched, " +
      s"x-sorted touches $linTouched")
    // content identical either way
    assert(spark.read.parquet(s"$dir/z").filter(pred).count() ===
      spark.read.parquet(s"$dir/linear").filter(pred).count())
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
