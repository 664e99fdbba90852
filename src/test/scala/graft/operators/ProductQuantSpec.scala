package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** TRUE product quantization (round-13 verdict #1). Pins:
  * (1) the COMPRESSION CLASS — m codebook indices per vector (m = 8
  *     bytes of entropy here, not dim = 64), codebooks bounded K ≤ 256;
  * (2) persisted `IvfIndex.searchPq` == inline `ProductQuant.adcSearch`,
  *     reopen identical;
  * (3) recall at the EQUAL probe budget (k, nprobe, refine) of the SQ8
  *     query: PQ's brute-force recall ≥ SQ8's — the verdict's gate for
  *     claiming the 100-TB memory math without losing the search;
  * (4) Lloyd actually trains: total within-codeword SSE after the
  *     training step ≤ the seed codebooks' SSE.
  */
class ProductQuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private val Modulus = 97
  private val K = 10
  private val NProbe = 8
  private val Refine = 3
  private val M = ProductQuant.M
  private val CbMod = ProductQuant.CbMod

  private def corpus = graft.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")
  private def cents = corpus.filter(col("vec_id") % Modulus === 0)
    .select(col("vec_id").as("cid"), col("embedding").as("cv"))
  private def queriesDf = corpus.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

  test("compression class: m codes per vector, every code < K <= 256, " +
      "codebooks are m tables of subDim-dim words") {
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val books = ProductQuant.train(assigned, cents, M, CbMod)
    val bookRows = books.collect()
    val kPerSub = bookRows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(kPerSub.keySet == (0L until M).toSet, "one codebook per subspace")
    assert(kPerSub.values.forall(k => k > 1 && k <= 256),
      s"codebook sizes out of the one-byte class: $kPerSub")
    assert(bookRows.forall(_.getSeq[Double](2).size == 64 / M),
      "codeword dimensionality != dim/m")
    val codes = ProductQuant.encode(assigned, cents, books, M)
    val bad = codes.filter(
      size(col("codes")) =!= M ||
        expr(s"exists(codes, c -> c < 0 OR c >= 256)"))
    assert(bad.isEmpty, "codes outside the m-byte contract")
    assert(codes.count() == corpus.count())
  }

  test("argmin_l2sq6 encode == the min_by(round-6 vec_l2sq) formulation " +
      "on the full corpus (round-14 hot-path rewrite equivalence)") {
    graft.functions.VectorOps.ensure(spark)
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val books = ProductQuant.train(assigned, cents, M, CbMod)
    val subs = ProductQuant.subvectors(
      ProductQuant.residuals(assigned, cents), M)
    // the pre-round-14 shape: K-way row fan-out + min_by argmin
    val legacy = subs.join(broadcast(books), "sub")
      .withColumn("d2",
        round(graft.functions.VectorOps.l2sq(col("rs"), col("cw")), 6))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
    val fast = ProductQuant.encode(assigned, cents, books, M)
      .select(col("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").cast("long").as("sub"),
        col("col").as("code"))
    assert(fast.count() == legacy.count())
    assert(fast.except(legacy).isEmpty, "argmin codes diverge from min_by")
    assert(legacy.except(fast).isEmpty, "min_by codes diverge from argmin")
  }

  test("subvectorsOf (slice-first) == subvectors(residuals) on the full " +
      "corpus (round-14 hot-path equivalence: slice commutes with zip_with)") {
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val composed = ProductQuant.subvectors(
      ProductQuant.residuals(assigned, cents), M)
    val fused = ProductQuant.subvectorsOf(assigned, cents, M)
    assert(fused.count() == composed.count())
    assert(fused.except(composed).isEmpty,
      "slice-first subvectors diverge from the composed form")
    assert(composed.except(fused).isEmpty,
      "composed subvectors diverge from the slice-first form")
  }

  test("Lloyd trains: within-codeword SSE after the step <= seed SSE") {
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val res = ProductQuant.residuals(assigned, cents)
    val subs = ProductQuant.subvectors(res, M)
    def sse(books: org.apache.spark.sql.DataFrame): Double = {
      // nearest-codeword distance per subvector, summed
      subs.join(broadcast(books), "sub")
        .withColumn("diff", expr("zip_with(rs, cw, (x, y) -> x - y)"))
        .withColumn("d2", graft.functions.VectorOps.dot(col("diff"), col("diff")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(col("d2")).as("d2"))
        .agg(sum(col("d2"))).head().getDouble(0)
    }
    val seeds = ProductQuant.train(assigned, cents, M, CbMod, iters = 0)
    val trained = ProductQuant.train(assigned, cents, M, CbMod, iters = 1)
    val (s0, s1) = (sse(seeds), sse(trained))
    assert(s1 <= s0 + 1e-6, s"training increased SSE: $s0 -> $s1")
    assert(s1 < s0, s"training had no effect: $s0 -> $s1")
  }

  test("persisted searchPq == inline adcSearch; reopen identical") {
    val dir = Files.createTempDirectory("pq-idx").toString
    val idx = IvfIndex.buildPq(corpus, dir, Modulus)
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val books = ProductQuant.train(assigned, cents, M, CbMod)
    val inline = ProductQuant.adcSearch(
      ProductQuant.encode(assigned, cents, books, M), books, cents,
      corpus, queriesDf, K, NProbe, Refine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val persisted = idx.searchPq(queriesDf, K, NProbe, Refine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(persisted == inline)
    assert(persisted.nonEmpty)
    val reopened = new IvfIndex(spark, dir).searchPq(queriesDf, K, NProbe, Refine)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(reopened == persisted)
  }

  test("recall at equal probe budget: PQ >= SQ8 vs brute force; " +
      "PQ top-10 overlaps unquantized IVF >= 80% per query") {
    val assigned = SimilarityOps.ivfAssign(corpus, Modulus)
    val books = ProductQuant.train(assigned, cents, M, CbMod)
    val pq = topSet(ProductQuant.adcSearch(
      ProductQuant.encode(assigned, cents, books, M), books, cents,
      corpus, queriesDf, K, NProbe, Refine))
    val sq8 = topSet(SimilarityOps.ivfSq8Search(
      SimilarityOps.sq8Codes(assigned, cents), cents, corpus, queriesDf,
      K, NProbe, Refine))
    val brute = topSet(SimilarityOps.bruteForceTopK(corpus, queriesDf, K))
    def avgRecall(m: Map[Long, Set[Long]]): Double =
      m.map { case (qid, ids) => ids.intersect(brute(qid)).size.toDouble / K }
        .sum / m.size
    val (rPq, rSq8) = (avgRecall(pq), avgRecall(sq8))
    assert(rPq >= rSq8,
      s"PQ recall $rPq < SQ8 recall $rSq8 at equal probe budget")
    assert(rPq >= 0.7, s"PQ recall vs brute force = $rPq")
    val exactIvf = topSet(
      SimilarityOps.ivfSearch(assigned, cents, queriesDf, K, NProbe))
    pq.foreach { case (qid, ids) =>
      val overlap = ids.intersect(exactIvf(qid)).size.toDouble / K
      assert(overlap >= 0.8, s"qid $qid: PQ recall vs IVF = $overlap")
    }
  }
}
