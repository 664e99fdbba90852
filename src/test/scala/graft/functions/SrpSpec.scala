package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SRP-LSH contract:
  *
  *  1. the hyperplane-sign arithmetic is EXACTLY the documented integer
  *     recurrence (a reference reimplementation here must agree with
  *     both the interpreted eval and the codegen path) — the DuckDB
  *     oracle mirrors this arithmetic, so any drift would silently
  *     break q_dedup_embedding_lsh's cross-engine determinism;
  *  2. on a planted near-duplicate corpus (cos ≈ 0.99) the 16×8 band
  *     join recalls every planted pair while candidates stay a small
  *     fraction of all pairs — the property that makes it the scale
  *     path (testdata embeddings are near-orthogonal, so the planted
  *     corpus is where LSH's selectivity is actually demonstrated).
  */
class SrpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Bands = 16
  private val Bits = 8

  /** Reference reimplementation (independent of the Catalyst code). */
  private def refBuckets(x: Array[Float], bands: Int, bits: Int): Array[Int] = {
    val dims = x.length
    Array.tabulate(bands) { b =>
      (0 until bits).foldLeft(0) { (bucket, j) =>
        val p = b * bits + j
        var acc = 0.0
        var i = 0
        while (i < dims) {
          val k = p.toLong * dims + i
          val h1 = (k * 2654435761L) % 4294967296L
          val h2 = ((h1 ^ (h1 >> 16)) * 40503L) % 4294967296L
          val v = x(i).toDouble
          acc += (if (((h2 ^ (h2 >> 15)) & 1L) == 1L) v else -v)
          i += 1
        }
        if (acc >= 0.0) bucket | (1 << j) else bucket
      }
    }
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  // Deterministic corpus: 150 random base vectors (dim 32) + a
  // perturbed near-duplicate of each of the first 40.
  private lazy val (vectors, plantedPairs) = {
    val rnd = new scala.util.Random(42)
    val base = Array.fill(150)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val dups = (0 until 40).map { i =>
      val d = base(i).map(v => v + 0.12f * rnd.nextGaussian().toFloat)
      (150L + i, d)
    }
    val all = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ dups
    val pairs = dups.map { case (id, _) => (id - 150L, id) }.toSet
    (all.toSeq, pairs)
  }

  test("srp_buckets: codegen, interpreted eval, and the reference arithmetic agree") {
    SrpExpressions.register(spark)
    val df = vectors.toDF("vec_id", "embedding")
    val viaCodegen = df
      .select(col("vec_id"), call_function("srp_buckets", col("embedding"),
        lit(Bands), lit(Bits)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    vectors.foreach { case (id, v) =>
      val ref = refBuckets(v, Bands, Bits)
      assert(viaCodegen(id).sameElements(ref), s"codegen mismatch for vec $id")
      val interp = SrpBuckets(
        org.apache.spark.sql.catalyst.expressions.Literal.create(v,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        Bands, Bits)
        .nullSafeEval(new GenericArrayData(v))
        .asInstanceOf[GenericArrayData].toIntArray()
      assert(interp.sameElements(ref), s"eval mismatch for vec $id")
    }
  }

  test("planted near-dups (cos≈0.99) collide in at least one band; candidates stay sparse") {
    SrpExpressions.register(spark)
    // Sanity: the planted pairs really are high-cosine.
    val byId = vectors.toMap
    plantedPairs.foreach { case (a, b) =>
      assert(cosine(byId(a), byId(b)) > 0.95, s"planting failed for ($a,$b)")
    }

    val banded = vectors.toDF("vec_id", "embedding")
      .select(col("vec_id"), posexplode(call_function("srp_buckets",
        col("embedding"), lit(Bands), lit(Bits))))
      .toDF("vec_id", "band", "bucket")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("b.vec_id") > col("a.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val missed = plantedPairs -- cand
    assert(missed.isEmpty, s"LSH missed planted pairs: $missed")

    val n = vectors.size
    val allPairs = n.toLong * (n - 1) / 2
    assert(cand.size < allPairs * 0.15,
      s"candidate set not sparse: ${cand.size} of $allPairs pairs")
  }

  test("srp candidate generation is partitioning-independent") {
    SrpExpressions.register(spark)
    def run(parts: Int) = {
      val banded = vectors.toDF("vec_id", "embedding").repartition(parts)
        .select(col("vec_id"), posexplode(call_function("srp_buckets",
          col("embedding"), lit(Bands), lit(Bits))))
        .toDF("vec_id", "band", "bucket")
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("b.vec_id") > col("a.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(1) == run(11))
  }
}
