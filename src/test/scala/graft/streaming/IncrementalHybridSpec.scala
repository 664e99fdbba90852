package graft.streaming

import graft.TestSpark
import graft.operators.{Bm25, HybridRetrieval, SimilarityOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Hybrid retrieval over the stream-maintained indexes must be
  * indistinguishable from the batch q_hybrid_retrieval:
  *  1. stream==batch — documents ingested into the postings index in 3
  *     micro-batches, embeddings bootstrapped + streamed into the
  *     IVF-SQ8 index in 3 slices, fused read == the oracle-backed batch
  *     query (both legs split-invariant by their own contracts; the
  *     fusion is the SHARED HybridRetrieval.fuse);
  *  2. takedown parity — tombstoning one document in BOTH indexes
  *     (IncrementalHybrid.takedown) makes the fused read equal a batch
  *     fusion recomputed over the reduced corpus with the original
  *     centroid set (tombstones never touch centroids).
  */
class IncrementalHybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val terms = Seq("hash", "join", "filter")

  private def docs = graft.table(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))
  private def corpus = graft.table(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")
  private def queries = corpus.filter(col("vec_id") === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  /** (doc_id, lex_rnk|-1, ann_rnk|-1, rrf_fp, rnk) in rank order. */
  private def asT(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq.sortBy(_._5)

  /** The batch lexical leg (q_bm25's construction) over `d`. */
  private def lexLeg(d: DataFrame): DataFrame = {
    val w = d.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    val dl = w.select(col("doc_id"), size(col("w")).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val postings = w.select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
    Bm25.rank(postings, stats, 20)
      .select(col("doc_id"), col("rnk").as("lex_rnk"))
  }

  /** Build both maintained indexes over the full sf0.001 corpus —
    * postings in 3 ingest batches, IVF-SQ8 bootstrapped on a slice that
    * contains EVERY corpus centroid (vec_id % 97 == 0 — so the
    * maintained centroid table equals the batch query's deterministic
    * sample) then streamed in 2 more slices. */
  private def buildIndexes(): (String, String) = {
    val pDir = Files.createTempDirectory("hybrid-post").toString
    (0 to 2).foreach { m =>
      IncrementalPostings.processBatch(
        docs.filter(col("doc_id") % 3 === m), pDir, m.toLong)
    }
    val vDir = Files.createTempDirectory("hybrid-ivf").toString
    IncrementalIvf.bootstrapSq8(
      corpus.filter(col("vec_id") % 97 === 0 || col("vec_id") < 250),
      vDir, 97)
    IncrementalIvf.processBatch(
      corpus.filter(col("vec_id") % 97 =!= 0 &&
        col("vec_id") >= 250 && col("vec_id") < 375), vDir, 1L)
    IncrementalIvf.processBatch(
      corpus.filter(col("vec_id") % 97 =!= 0 && col("vec_id") >= 375),
      vDir, 2L)
    (pDir, vDir)
  }

  test("fused read over the maintained indexes == batch q_hybrid_retrieval") {
    val (pDir, vDir) = buildIndexes()
    val expected = asT(
      graft.SparkEntry.queries("q_hybrid_retrieval")(spark, sfDir))
    val got = asT(IncrementalHybrid.search(
      spark, pDir, vDir, terms, queries, k = 10))
    assert(got == expected, s"stream != batch: got=${got.take(3)}")
    assert(got.size == 10)
    // the fusion is genuinely hybrid on this corpus: at least one
    // fused doc carries both ranks, and the integer RRF is consistent
    got.foreach { case (_, l, a, fp, _) =>
      val want = (if (l > 0) HybridRetrieval.FP / (HybridRetrieval.C + l) else 0L) +
        (if (a > 0) HybridRetrieval.FP / (HybridRetrieval.C + a) else 0L)
      assert(fp == want, s"rrf_fp mismatch: $fp != $want")
    }
    assert(got.exists(t => t._2 > 0 && t._3 > 0),
      "no doc ranked in both legs — fusion test is vacuous")
  }

  test("3-leg fused read (BM25 ⊕ phrase ⊕ ANN) over the maintained " +
      "indexes == batch q_hybrid_retrieval_3way") {
    val (pDir, vDir) = buildIndexes()
    val expected = graft.SparkEntry
      .queries("q_hybrid_retrieval_3way")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq.sortBy(_._4)
    val got = IncrementalHybrid.search3(spark, pDir, vDir, terms,
        phrase = Seq("hash", "join"), queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq.sortBy(_._4)
    assert(got == expected, s"3-leg stream != batch: got=${got.take(3)}")
    // at least one doc must be ranked by more than one system, else
    // the n_legs agreement signal is untested
    assert(got.exists(_._2 > 1L), "no multi-leg agreement — vacuous")
  }

  test("per-query fused read (searchMulti) over the maintained indexes " +
      "== batch q_hybrid_retrieval_multi") {
    val (pDir, vDir) = buildIndexes()
    val expected = graft.SparkEntry
      .queries("q_hybrid_retrieval_multi")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val termsByQid = Seq(
      0L -> Seq("hash", "join", "filter"),
      1L -> Seq("sort", "merge", "scan"),
      2L -> Seq("row", "batch"))
    val multiQueries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = IncrementalHybrid.searchMulti(
        spark, pDir, vDir, termsByQid, multiQueries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected, "multi-query stream != batch")
    assert(got.map(_._1) == Set(0L, 1L, 2L), "missing a query's ranking")
    // per-query ranks are each a dense 1..10
    Seq(0L, 1L, 2L).foreach { q =>
      assert(got.filter(_._1 == q).map(_._5) == (1L to 10L).toSet)
    }
  }

  test("single-query fusion rejects a multi-row queries frame " +
      "(the silent-double-count guard)") {
    val (pDir, vDir) = buildIndexes()
    val two = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    intercept[IllegalArgumentException] {
      IncrementalHybrid.search(spark, pDir, vDir, terms, two, k = 10)
    }
    intercept[IllegalArgumentException] {
      IncrementalHybrid.search3(spark, pDir, vDir, terms,
        phrase = Seq("hash", "join"), two, k = 10)
    }
  }

  test("takedown in both indexes == batch fusion over the reduced corpus") {
    val (pDir, vDir) = buildIndexes()
    val before = asT(IncrementalHybrid.search(
      spark, pDir, vDir, terms, queries, k = 10))
    // victim: a fused top-10 doc that is neither the query vector nor
    // a centroid (centroids survive takedowns by design)
    val victim = before.map(_._1)
      .find(id => id != 0L && id % 97 != 0L).get
    IncrementalHybrid.takedown(spark, pDir, vDir, Seq(victim), deleteId = 1L)
    val after = asT(IncrementalHybrid.search(
      spark, pDir, vDir, terms, queries, k = 10))
    assert(!after.exists(_._1 == victim), "tombstoned doc still served")
    // expected: the SAME batch construction over the reduced corpus,
    // original centroids pinned
    val cents = corpus.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val redCorpus = corpus.filter(col("vec_id") =!= victim)
    val annRed = SimilarityOps.ivfSq8Search(
        SimilarityOps.sq8Codes(
          SimilarityOps.ivfAssignTo(redCorpus, cents), cents),
        cents, redCorpus, queries, k = 20, nprobe = 8, refine = 3)
      .select(col("vec_id").as("doc_id"), col("rn").as("ann_rnk"))
    val lexRed = lexLeg(docs.filter(col("doc_id") =!= victim))
    val expected = asT(HybridRetrieval.fuse(lexRed, annRed, 10))
    assert(after == expected, "post-takedown fusion != reduced-corpus batch")
  }
}
