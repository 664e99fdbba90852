package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval EVALUATION (round-13 verdict #4): recall@k, MRR@k
  * and nDCG@k over a qrels table — the harness a retrieval deployment
  * tunes its fusion constants against. Entirely INTEGER-EXACT:
  *  - MRR is 10¹² div (first relevant rank) — the RRF fixed-point;
  *  - nDCG's transcendental 1/log2(1+r) discount is a 60-entry table
  *    of precomputed floor(10⁹/log2(1+r)) constants (the q_benford
  *    constant-column move — no cross-engine log), graded gains are
  *    2^rel−1 ∈ {1,3,7}, DCG/IDCG are bigint sums and the final
  *    normalization is one integer division at 10⁶ scale;
  * so the whole metric row hash-matches any engine.
  *
  * Scale shape: rankings are top-k lists (bounded per system × query);
  * qrels is the judged set (bounded per query). Everything here joins
  * and aggregates bounded frames — the corpus never appears.
  */
object RetrievalEval {

  /** floor(10⁹ / log2(1+r)) for r = 1..60 — the nDCG rank discount as
    * fixed-point constants. */
  val Wfp: Seq[Long] = Seq(
    1000000000L, 630929753L, 500000000L, 430676558L, 386852807L,
    356207187L, 333333333L, 315464876L, 301029995L, 289064826L,
    278942945L, 270238154L, 262649535L, 255958024L, 250000000L,
    244650542L, 239812466L, 235408913L, 231378213L, 227670248L,
    224243824L, 221064729L, 218104291L, 215338279L, 212746053L,
    210309917L, 208014597L, 205846832L, 203795047L, 201849086L,
    200000000L, 198239863L, 196561632L, 194959021L, 193426403L,
    191958720L, 190551412L, 189200359L, 187901824L, 186652411L,
    185449023L, 184288833L, 183169250L, 182087900L, 181042596L,
    180031326L, 179052231L, 178103593L, 177183820L, 176291434L,
    175425063L, 174583430L, 173765342L, 172969690L, 172195433L,
    171441600L, 170707279L, 169991616L, 169293807L, 168613098L)

  private def wfpAt(rank: org.apache.spark.sql.Column) =
    element_at(array(Wfp.map(lit): _*), rank.cast("int"))

  private def gainOf(rel: org.apache.spark.sql.Column) =
    when(rel === 3, lit(7L)).when(rel === 2, lit(3L)).otherwise(lit(1L))

  /** Evaluate `rankings` (system, qid, doc_id, rnk) against `qrels`
    * (qid, doc_id, rel ∈ 1..3) at cutoff k ≤ 60 (and ≤ 60 judged docs
    * per query — the discount table's range). Returns one row per
    * (system, qid): hits, n_rel, mrr_fp (10¹²·MRR), dcg_fp, idcg_fp,
    * ndcg_fp (10⁶·nDCG). */
  def evaluate(rankings: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k <= Wfp.size, s"cutoff $k exceeds the discount table")
    val hits = rankings.filter(col("rnk") <= k)
      .join(qrels, Seq("qid", "doc_id"), "left")
      .groupBy("system", "qid")
      .agg(
        count(col("rel")).cast("long").as("hits"),
        coalesce(max(when(col("rel").isNotNull,
          expr("1000000000000 div rnk"))), lit(0L)).as("mrr_fp"),
        coalesce(sum(when(col("rel").isNotNull,
          gainOf(col("rel")) * wfpAt(col("rnk")))), lit(0L)).as("dcg_fp"))
    val ideal = qrels
      .withColumn("irn", row_number().over(
        Window.partitionBy("qid").orderBy(col("rel").desc, col("doc_id"))))
      .groupBy("qid")
      .agg(sum(gainOf(col("rel")) * wfpAt(col("irn"))).as("idcg_fp"),
        count(lit(1)).cast("long").as("n_rel"))
    hits.join(broadcast(ideal), "qid")
      .select(col("system"), col("qid"), col("hits"), col("n_rel"),
        col("mrr_fp"), col("dcg_fp"), col("idcg_fp"),
        expr("dcg_fp * 1000000 div idcg_fp").as("ndcg_fp"))
  }
}

/** Round-14 coverage: PER-QUERY hybrid retrieval (verdict #2) and the
  * ranked-eval metrics over it (verdict #4). The round-13 hybrid
  * queries fuse rankings for ONE query; this module lifts the whole
  * read path to an EVAL BATCH — per-query BM25 vocabularies
  * ([[Bm25.rankByQuery]]), the multi-query quantized ANN the engine
  * already had (q_sim_topk_multi's shape through ivfSq8Search), and
  * qid-keyed RRF ([[HybridRetrieval.fuseByQuery]]) — then scores the
  * fused ranking against exact-search relevance with
  * [[RetrievalEval]]. */
object Coverage21 {

  /** The three keyword queries (qid → vocabulary). */
  private val QTerms: Seq[(Long, String)] = Seq(
    0L -> "hash", 0L -> "join", 0L -> "filter",
    1L -> "sort", 1L -> "merge", 1L -> "scan",
    2L -> "row", 2L -> "batch")

  private val qtValues =
    QTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  /** Per-query BM25 chain ending in `lex(qid, doc_id, rnk ≤ 20)` —
    * tf/df/dl/stats computed ONCE over the union vocabulary, the
    * per-query filter applied at scoring time. */
  private[operators] val lexMultiCtes =
    s"""qt AS (SELECT CAST(q AS BIGINT) AS qid, t AS term
      |       FROM (VALUES $qtValues) v(q, t)),
      |docs AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM docs),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |tok AS (SELECT doc_id, unnest(w) AS term FROM docs),
      |vocab AS (SELECT DISTINCT term FROM qt),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM tok JOIN vocab USING (term) GROUP BY 1, 2),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |score AS (
      |  SELECT qt.qid, tf.doc_id,
      |    sum(CAST(
      |      ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
      |        * tf.tf * (1.2 + 1)
      |        / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
      |      AS DECIMAL(38,10))) AS sc
      |  FROM tf JOIN df USING (term) JOIN qt USING (term)
      |  JOIN dl USING (doc_id) CROSS JOIN stats s
      |  GROUP BY 1, 2),
      |lex AS (SELECT qid, doc_id, rnk FROM (
      |    SELECT qid, doc_id,
      |      CAST(row_number() OVER (PARTITION BY qid
      |        ORDER BY sc DESC, doc_id) AS BIGINT) AS rnk
      |    FROM score) WHERE rnk <= 20)""".stripMargin

  /** q_sim_ann_ivfsq8's chain for query vectors 0..2, per-qid top-20,
    * ending in `ann(qid, doc_id, rnk)`. */
  private[operators] val annMultiCtes =
    """c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
      |vq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
      |ax AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS a, unnest(c.cv) AS b
      |       FROM embeddings e CROSS JOIN c),
      |ad AS (SELECT vec_id, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
      |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
      |       FROM ax GROUP BY 1, 2),
      |asg AS (SELECT vec_id, cid,
      |          ROW_NUMBER() OVER (PARTITION BY vec_id
      |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS rn
      |        FROM ad),
      |assigned AS (SELECT vec_id, cid AS centroid_id FROM asg WHERE rn = 1),
      |res AS (
      |  SELECT a.vec_id, a.centroid_id,
      |    list_transform(e.embedding, (x, i) -> CAST(x AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) AS r
      |  FROM assigned a JOIN embeddings e USING (vec_id) JOIN c ON c.cid = a.centroid_id),
      |sq AS (
      |  SELECT vec_id, centroid_id, r,
      |    CASE WHEN list_max(list_transform(r, x -> abs(x))) > 0
      |         THEN 127.0 / list_max(list_transform(r, x -> abs(x))) ELSE 0.0 END AS sc
      |  FROM res),
      |codes AS (SELECT vec_id, centroid_id, sc,
      |    list_transform(r, x -> CAST(floor(x * sc + 0.5) AS BIGINT)) AS q8 FROM sq),
      |px AS (SELECT vq.qid, c.cid, unnest(vq.qv) AS a, unnest(c.cv) AS b
      |       FROM vq CROSS JOIN c),
      |pd AS (SELECT qid, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
      |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
      |       FROM px GROUP BY 1, 2),
      |probes AS (SELECT qid, cid FROM (
      |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS pr
      |    FROM pd) WHERE pr <= 8),
      |recon AS (
      |  SELECT k.vec_id, k.centroid_id,
      |    list_transform(c.cv, (cx, i) -> CAST(cx AS DOUBLE) +
      |      CASE WHEN k.sc = 0 THEN 0.0 ELSE k.q8[i] / k.sc END) AS xhat
      |  FROM codes k JOIN c ON c.cid = k.centroid_id),
      |appxu AS (
      |  SELECT p.qid, r.vec_id, unnest(r.xhat) AS a, unnest(vq.qv) AS b
      |  FROM probes p
      |  JOIN recon r ON r.centroid_id = p.cid
      |  JOIN vq ON vq.qid = p.qid
      |  WHERE r.vec_id <> p.qid),
      |appxd AS (SELECT qid, vec_id, sum(a * CAST(b AS DOUBLE)) AS dot,
      |              sum(a * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
      |       FROM appxu GROUP BY 1, 2),
      |shortlist AS (SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
      |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS ar
      |    FROM appxd) WHERE ar <= 60),
      |cx AS (SELECT sl.qid, sl.vec_id, unnest(e.embedding) AS a, unnest(vq.qv) AS b
      |       FROM shortlist sl JOIN embeddings e ON e.vec_id = sl.vec_id
      |       JOIN vq ON vq.qid = sl.qid),
      |cd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
      |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
      |       FROM cx GROUP BY 1, 2),
      |sc2 AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM cd),
      |ann AS (SELECT qid, vec_id AS doc_id, rnk FROM (
      |    SELECT qid, vec_id,
      |      CAST(ROW_NUMBER() OVER (PARTITION BY qid
      |        ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
      |    FROM sc2) WHERE rnk <= 20)""".stripMargin

  /** qid-keyed RRF of lex ⊕ ann, ending in `fsel(qid, doc_id, n_legs,
    * rrf_fp, rnk ≤ 10)`. */
  private[operators] val fusedCtes =
    """fused AS (
      |  SELECT qid, doc_id, CAST(count(*) AS BIGINT) AS n_legs,
      |    CAST(sum(1000000000000 // (60 + rnk)) AS BIGINT) AS rrf_fp
      |  FROM (SELECT qid, doc_id, rnk FROM lex
      |        UNION ALL SELECT qid, doc_id, rnk FROM ann) u
      |  GROUP BY 1, 2),
      |fsel AS (SELECT qid, doc_id, n_legs, rrf_fp, rnk FROM (
      |    SELECT qid, doc_id, n_legs, rrf_fp,
      |      CAST(row_number() OVER (PARTITION BY qid
      |        ORDER BY rrf_fp DESC, doc_id) AS BIGINT) AS rnk
      |    FROM fused) WHERE rnk <= 10)""".stripMargin

  /** Spark-side legs. */
  private def lexMultiLeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qterms = QTerms.toDF("qid", "term")
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
    val dl = docs.select(col("doc_id"), size(col("w")).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("long").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val vocab = qterms.select("term").distinct()
    val postings = docs
      .select(col("doc_id"), explode(col("w")).as("term"))
      .join(broadcast(vocab), "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
    Bm25.rankByQuery(postings, qterms, stats, 20)
      .select(col("qid"), col("doc_id"), col("rnk"))
  }

  private def annMultiLeg(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "embeddings")
    val centroids = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val vq = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    SimilarityOps.ivfSq8Search(
        SimilarityOps.sq8Codes(SimilarityOps.ivfAssign(e, 97), centroids),
        centroids, e, vq, k = 20, nprobe = 8, refine = 3)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rn").as("rnk"))
  }

  private[operators] def fusedMulti(s: SparkSession, dir: String): DataFrame =
    HybridRetrieval.fuseByQuery(
      Seq(lexMultiLeg(s, dir), annMultiLeg(s, dir)), 10)

  val defs: Seq[QDef] = Seq(

    // ---- per-query hybrid retrieval: the eval-batch shape ------------
    // Three queries, each with its own keyword vocabulary AND its own
    // query vector, fused per qid: BM25 ingredients (tf/df/dl/stats)
    // computed ONCE over the union vocabulary with the per-query
    // filter applied at scoring (queries × terms broadcast — no
    // re-scan per query), the ANN leg the per-qid quantized search the
    // engine already proves, and the RRF rank qid-PARTITIONED (the
    // round-13 verdict's unpartitioned-window fix). Integer fusion —
    // DuckDB recomputes end to end.
    QDef("q_hybrid_retrieval_multi",
      s"""WITH $lexMultiCtes,
        |$annMultiCtes,
        |$fusedCtes
        |SELECT qid, doc_id, n_legs, rrf_fp, rnk FROM fsel
        |""".stripMargin) { (s, dir) =>
      fusedMulti(s, dir)
    },

    // ---- ranked-retrieval eval: recall@10 / MRR@10 / nDCG@10 ---------
    // Scores TWO systems per query — the BM25-only leg and the fused
    // hybrid ranking — against graded relevance derived from the EXACT
    // brute-force cosine top-10 (grades 3/2/1 by band: the planted
    // ground truth ANN is supposed to recover). All metric arithmetic
    // is integer fixed-point (MRR = 10¹² div first-hit rank; nDCG's
    // log2 discount is a constant table, gains 2^rel−1, one integer
    // division at the edge), so the full metric row hash-matches.
    // RetrievalEvalSpec pins fused ≥ BM25-only on every metric.
    QDef("q_retrieval_eval",
      s"""WITH $lexMultiCtes,
        |$annMultiCtes,
        |$fusedCtes,
        |bx2 AS (SELECT vq.qid, e.vec_id, unnest(e.embedding) AS a, unnest(vq.qv) AS b
        |        FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> vq.qid),
        |bd2 AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |               sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |        FROM bx2 GROUP BY 1, 2),
        |qrels AS (SELECT qid, vec_id AS doc_id,
        |            CASE WHEN brn <= 3 THEN 3 WHEN brn <= 6 THEN 2 ELSE 1 END AS rel
        |          FROM (SELECT qid, vec_id,
        |              ROW_NUMBER() OVER (PARTITION BY qid
        |                ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS brn
        |            FROM bd2) WHERE brn <= 10),
        |wt AS (SELECT rnk, CAST(wfp AS BIGINT) AS wfp FROM (VALUES
        |    (1, 1000000000), (2, 630929753), (3, 500000000), (4, 430676558),
        |    (5, 386852807), (6, 356207187), (7, 333333333), (8, 315464876),
        |    (9, 301029995), (10, 289064826)) w(rnk, wfp)),
        |rankings AS (
        |  SELECT 'bm25' AS system, qid, doc_id, rnk FROM lex WHERE rnk <= 10
        |  UNION ALL
        |  SELECT 'fused' AS system, qid, doc_id, rnk FROM fsel),
        |scored AS (SELECT r.system, r.qid,
        |    CAST(count(q.rel) AS BIGINT) AS hits,
        |    CAST(coalesce(max(CASE WHEN q.rel IS NOT NULL
        |      THEN 1000000000000 // r.rnk END), 0) AS BIGINT) AS mrr_fp,
        |    CAST(coalesce(sum(CASE WHEN q.rel IS NOT NULL
        |      THEN (CASE q.rel WHEN 3 THEN 7 WHEN 2 THEN 3 ELSE 1 END) * w.wfp
        |      END), 0) AS BIGINT) AS dcg_fp
        |  FROM rankings r
        |  JOIN wt w ON w.rnk = r.rnk
        |  LEFT JOIN qrels q ON q.qid = r.qid AND q.doc_id = r.doc_id
        |  GROUP BY 1, 2),
        |ideal AS (SELECT qid,
        |    CAST(sum((CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 ELSE 1 END) * w.wfp) AS BIGINT) AS idcg_fp,
        |    CAST(count(*) AS BIGINT) AS n_rel
        |  FROM (SELECT qid, rel,
        |          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS irn
        |        FROM qrels) i
        |  JOIN wt w ON w.rnk = i.irn
        |  GROUP BY 1)
        |SELECT s.system, s.qid, s.hits, i.n_rel, s.mrr_fp, s.dcg_fp, i.idcg_fp,
        |  CAST(s.dcg_fp * 1000000 // i.idcg_fp AS BIGINT) AS ndcg_fp
        |FROM scored s JOIN ideal i USING (qid)
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val vq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val qrels = SimilarityOps.bruteForceTopK(e, vq, 10)
        .select(col("qid"), col("vec_id").as("doc_id"),
          when(col("rn") <= 3, lit(3)).when(col("rn") <= 6, lit(2))
            .otherwise(lit(1)).as("rel"))
      // round-14: the BM25 leg is a full corpus pipeline consumed by
      // BOTH systems (standalone row and inside the fusion) — its
      // output is bounded (≤ qids·20 rows), so one localCheckpoint
      // halves the lexical pipeline evaluations (guide §1.2: don't
      // compute things twice; the grid-sized-intermediate idiom)
      val lex = lexMultiLeg(s, dir).localCheckpoint()
      val rankings = lex.filter(col("rnk") <= 10)
        .select(lit("bm25").as("system"), col("qid"), col("doc_id"), col("rnk"))
        .unionByName(
          HybridRetrieval.fuseByQuery(Seq(lex, annMultiLeg(s, dir)), 10)
            .select(lit("fused").as("system"), col("qid"), col("doc_id"),
              col("rnk")))
      RetrievalEval.evaluate(rankings, qrels, 10)
    }
  )
}
