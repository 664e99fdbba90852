package graft.operators

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring shared by the batch query (q_bm25) and the
  * stream-maintained inverted index
  * ([[graft.streaming.IncrementalPostings]]): one expression text, so
  * stream==batch equality is by construction, not by parallel
  * maintenance of two formulas.
  *
  * Contract: `postings` is (doc_id, term, tf, dl) RESTRICTED to the
  * query's terms — each row one (document, matched term) pair, `tf` the
  * term count in the doc, `dl` the doc's token length. `stats` is one
  * row (n BIGINT, avgdl DOUBLE) over the WHOLE corpus (matching and
  * non-matching docs — BM25's idf and length normalization are defined
  * against the full collection). df per term is derived here from the
  * postings (row count = documents containing the term).
  *
  * Score parity across engines (the oracle contract): each term's
  * contribution is deterministic double arithmetic with a fixed operand
  * order; the per-doc sum is decimal-cast so addition is
  * order-independent; the ranking orders by the EXACT decimal (not the
  * rounded display value) with doc_id tiebreak.
  */
object Bm25 {

  /** Top-k (doc_id, bm25, rnk) — k1 = 1.2, b = 0.75. */
  def rank(postings: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        col("tf") * (lit(1.2) + lit(1)) /
        (col("tf") + lit(1.2) *
          (lit(1) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    val score = postings.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id").agg(sum(dec(contrib)).as("sc"))
    score.orderBy(col("sc").desc, col("doc_id")).limit(k)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("sc").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"),
        round(col("sc").cast("double"), 6).as("bm25"), col("rnk"))
  }

  /** Per-QUERY top-k: `postings` covers the UNION of every query's
    * vocabulary (each row one (doc, matched term) pair, df per term
    * derived here — corpus-level, shared across queries); `qterms`
    * (qid, term) is the per-query vocabulary filter, broadcast to the
    * scored postings so each query only sums ITS terms. Per-term
    * contribution arithmetic is [[rank]]'s verbatim; the final rank is
    * a qid-PARTITIONED window over per-(qid, doc) decimal sums.
    * Returns (qid, doc_id, bm25, rnk ≤ k). */
  def rankByQuery(postings: DataFrame, qterms: DataFrame, stats: DataFrame,
      k: Int): DataFrame = {
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
        col("tf") * (lit(1.2) + lit(1)) /
        (col("tf") + lit(1.2) *
          (lit(1) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl")))
    val score = postings.join(broadcast(dfreq), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .groupBy("qid", "doc_id").agg(sum(dec(contrib)).as("sc"))
    score
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("sc").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("doc_id"),
        round(col("sc").cast("double"), 6).as("bm25"), col("rnk"))
  }
}
