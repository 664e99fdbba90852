package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranked-retrieval eval metrics (round-13 verdict #4). Pins:
  * (1) metric definitions on a hand-computable fixture — a perfect
  *     ranking scores nDCG = 10⁶ and MRR = 10¹²; a fully-irrelevant
  *     ranking scores all zeros; a known partial ranking matches the
  *     hand-derived fixed-point values;
  * (2) the verdict's gate on the planted corpus: the FUSED hybrid
  *     ranking ≥ the BM25-only leg on every metric for every query
  *     (relevance is exact-search ground truth, so the vector leg must
  *     pull the fusion above the keyword-only baseline). */
class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def df(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("system", "qid", "doc_id", "rnk")
  }

  private def qrels(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("qid", "doc_id", "rel")
  }

  test("perfect ranking: nDCG = 1e6, MRR = 1e12, hits = n_rel; " +
      "irrelevant ranking: zeros") {
    val judged = qrels(Seq((0L, 10L, 3), (0L, 11L, 2), (0L, 12L, 1)))
    // ideal order by (rel desc, doc_id) = 10, 11, 12
    val perfect = df(Seq(("s", 0L, 10L, 1L), ("s", 0L, 11L, 2L), ("s", 0L, 12L, 3L)))
    val p = RetrievalEval.evaluate(perfect, judged, 10).collect().head
    assert(p.getAs[Long]("hits") == 3 && p.getAs[Long]("n_rel") == 3)
    assert(p.getAs[Long]("mrr_fp") == 1000000000000L)
    assert(p.getAs[Long]("ndcg_fp") == 1000000L)
    assert(p.getAs[Long]("dcg_fp") == p.getAs[Long]("idcg_fp"))

    val miss = df(Seq(("s", 0L, 90L, 1L), ("s", 0L, 91L, 2L)))
    val m = RetrievalEval.evaluate(miss, judged, 10).collect().head
    assert(m.getAs[Long]("hits") == 0)
    assert(m.getAs[Long]("mrr_fp") == 0 && m.getAs[Long]("ndcg_fp") == 0)
  }

  test("partial ranking matches hand-derived fixed-point values") {
    // qrels: doc 10 rel 3 (gain 7), doc 11 rel 1 (gain 1)
    // ranking: rank 1 = irrelevant, rank 2 = doc 11, rank 3 = doc 10
    val judged = qrels(Seq((0L, 10L, 3), (0L, 11L, 1)))
    val r = df(Seq(("s", 0L, 99L, 1L), ("s", 0L, 11L, 2L), ("s", 0L, 10L, 3L)))
    val row = RetrievalEval.evaluate(r, judged, 10).collect().head
    assert(row.getAs[Long]("hits") == 2)
    // first relevant at rank 2
    assert(row.getAs[Long]("mrr_fp") == 1000000000000L / 2)
    // DCG = 1·w(2) + 7·w(3); IDCG = 7·w(1) + 1·w(2)
    val w = RetrievalEval.Wfp
    val dcg = 1 * w(1) + 7 * w(2)
    val idcg = 7 * w(0) + 1 * w(1)
    assert(row.getAs[Long]("dcg_fp") == dcg)
    assert(row.getAs[Long]("idcg_fp") == idcg)
    assert(row.getAs[Long]("ndcg_fp") == dcg * 1000000L / idcg)
  }

  test("cutoff respected: a hit past k does not score") {
    val judged = qrels(Seq((0L, 10L, 3)))
    val r = df(Seq(("s", 0L, 99L, 1L), ("s", 0L, 10L, 2L)))
    val at1 = RetrievalEval.evaluate(r, judged, 1).collect().head
    assert(at1.getAs[Long]("hits") == 0 && at1.getAs[Long]("ndcg_fp") == 0)
    val at2 = RetrievalEval.evaluate(r, judged, 2).collect().head
    assert(at2.getAs[Long]("hits") == 1)
  }

  test("q_retrieval_eval gate: fused >= bm25-only on hits, MRR and " +
      "nDCG for EVERY query, strictly better in aggregate") {
    val out = graft.SparkEntry.queries("q_retrieval_eval")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("system"), r.getAs[Long]("qid")) ->
        (r.getAs[Long]("hits"), r.getAs[Long]("mrr_fp"),
          r.getAs[Long]("ndcg_fp"))).toMap
    val qids = out.keys.map(_._2).toSet
    assert(qids.size == 3)
    qids.foreach { q =>
      val (bh, bm, bn) = out(("bm25", q))
      val (fh, fm, fn) = out(("fused", q))
      assert(fh >= bh && fm >= bm && fn >= bn,
        s"qid $q: fused ($fh,$fm,$fn) < bm25 ($bh,$bm,$bn)")
    }
    val fSum = qids.toSeq.map(q => out(("fused", q))._3).sum
    val bSum = qids.toSeq.map(q => out(("bm25", q))._3).sum
    assert(fSum > bSum, "fused not strictly better than bm25 in aggregate")
  }
}
