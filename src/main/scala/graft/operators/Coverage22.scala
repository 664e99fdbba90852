package graft.operators

import graft._
import graft.functions.{TopKBy, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 second wave: retrieval DIVERSITY (MMR re-rank), the
  * ANN tuning curve (recall@k vs nprobe), and pipeline OBSERVABILITY
  * (the corpus-prep funnel — which stage rejected each document).
  *
  * All three are read-side companions to machinery the engine already
  * proves: MMR re-ranks the brute-force candidates q_sim_topk_multi
  * produces, the recall curve sweeps the q_sim_ann_ivf probe budget,
  * and the funnel explains q_corpus_prep's output row by row. Every
  * ranking constant is integer fixed-point (the c6 = round(cos·1e6)
  * idiom), so DuckDB recomputes each query end to end.
  */
object Coverage22 {

  /** MMR selection size and candidate pool. Candidates are the per-qid
    * brute-force top-`CandK`; `Picks` documents are selected per query
    * by maximal marginal relevance with λ = 0.7 — at 10⁶·10 fixed-point
    * scale, mmr10 = 7·rel6 − 3·maxsim6, all-integer. */
  private val CandK = 12
  private val Picks = 5

  /** Greedy MMR selection over bounded candidate/pair frames: `cand`
    * is (qid, vec_id, rel6, rn) with rn = 1 the top candidate, `pairs`
    * is (qid, id1, id2, sim6) over the candidate set. Both inputs are
    * bounded BY CONSTRUCTION (≤ qids·CandK candidates from a top-k
    * aggregate, ≤ qids·CandK² pairs), so the greedy argmax runs on
    * collected rows — the engine's bounded-collect idiom (BPE top-1
    * merges, probe rows) — in exact integer arithmetic. Round-14
    * optimization (guide §1.2 "the distributed algorithm" / §5 driver
    * rules): the previous shape unrolled picks−1 join+argmax steps as
    * Spark jobs with an eager localCheckpoint per step — 4 extra jobs
    * whose inputs were tens of rows. Semantics replicated exactly:
    * pick 1 = rn 1; each later pick maximizes 7·rel6 − 3·maxsim6 over
    * candidates REACHABLE via a pair row to the selected set (the old
    * inner join — total here, pairs span the candidate set), maxsim6 =
    * max sim6 to any selected doc, argmax ties on smallest vec_id (the
    * min_by (−mmr10, vec_id) ordering). Shared by q_retrieval_mmr
    * (cosine relevance) and q_hybrid_mmr (fused-rank relevance). */
  private[operators] def mmrSelect(cand: DataFrame, pairs: DataFrame,
      picks: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val candRows = cand.select("qid", "vec_id", "rel6", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sim = pairs.select("qid", "id1", "id2", "sim6").collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long)]
    candRows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (qid, rows) =>
      rows.find(_._4 == 1L).foreach { first =>
        var selected = List(first._2)
        out += ((qid, 1L, first._2, first._3, 0L, first._3 * 7))
        var remaining = rows.filter(_._2 != first._2)
        var t = 2
        while (t <= picks && remaining.nonEmpty) {
          val scored = remaining.flatMap { c =>
            val sims = selected.flatMap(s => sim.get((qid, c._2, s)))
            if (sims.isEmpty) None
            else {
              val maxsim = sims.max
              Some((c._2, c._3, maxsim, c._3 * 7 - maxsim * 3))
            }
          }
          if (scored.nonEmpty) {
            val best = scored.minBy(x => (-x._4, x._1))
            out += ((qid, t.toLong, best._1, best._2, best._3, best._4))
            selected ::= best._1
            remaining = remaining.filter(_._2 != best._1)
          } else remaining = Array.empty
          t += 1
        }
      }
    }
    out.toSeq.toDF("qid", "pick", "vec_id", "rel6", "maxsim6", "mmr10")
  }

  /** Candidate-pair cosines at integer scale: (qid, id1, id2, sim6)
    * over the candidate ids joined back to their embeddings. */
  private def pairSimsOf(cand: DataFrame, e: DataFrame): DataFrame = {
    val ce = cand.select("qid", "vec_id").join(e, "vec_id")
      .select(col("qid"), col("vec_id"), col("embedding"))
    ce.alias("a").join(ce.alias("b"),
        col("a.qid") === col("b.qid") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.qid").as("qid"), col("a.vec_id").as("id1"),
        col("b.vec_id").as("id2"),
        round(round(VectorOps.cosine(col("a.embedding"), col("b.embedding")), 6)
          * 1000000, 0).cast("long").as("sim6"))
  }

  /** One unrolled MMR step for the DuckDB oracle: remaining candidates
    * score 7·rel6 − 3·max(sim6 to any already-selected), argmax picked
    * with (score DESC, vec_id) — exactly the Spark `min_by` ordering. */
  private def mmrStepSql(t: Int): String = {
    val prev = s"sel${t - 1}"
    s"""m$t AS (SELECT c.qid, c.vec_id, c.rel6, max(p.sim6) AS maxsim6
       |  FROM cand c JOIN pairs p ON p.qid = c.qid AND p.id1 = c.vec_id
       |  JOIN $prev s ON s.qid = p.qid AND s.vec_id = p.id2
       |  WHERE NOT EXISTS (SELECT 1 FROM $prev z
       |                    WHERE z.qid = c.qid AND z.vec_id = c.vec_id)
       |  GROUP BY 1, 2, 3),
       |p$t AS (SELECT qid, vec_id, CAST($t AS BIGINT) AS pick, rel6, maxsim6,
       |    CAST(rel6 * 7 - maxsim6 * 3 AS BIGINT) AS mmr10 FROM (
       |    SELECT qid, vec_id, rel6, maxsim6,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY rel6 * 7 - maxsim6 * 3 DESC, vec_id) AS rr
       |    FROM m$t) WHERE rr = 1),
       |sel$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$t)""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // ---- MMR diversified re-rank -------------------------------------
    // Maximal-marginal-relevance selection over the brute-force top-12
    // candidates of 3 query vectors: pick 1 = the top candidate; each
    // later pick maximizes 7·rel6 − 3·maxsim6 (λ = 0.7 at integer
    // scale), where maxsim6 is the candidate's largest cosine to any
    // already-picked document — the diversity-aware read a retrieval
    // consumer runs when near-duplicate hits waste its context budget.
    // Scale shape: the corpus appears ONLY in the candidate generation
    // (one brute-force pass) and the candidate-pair cosines (≤ CandK²
    // rows per query); the iterative selection runs over those two
    // bounded, locally-checkpointed frames — 4 unrolled argmax steps
    // of grid-sized joins, never a corpus re-scan. Fully deterministic
    // (integer scores, id tie-breaks) → full DuckDB oracle with the
    // same 5 steps unrolled as CTEs.
    QDef("q_retrieval_mmr",
      s"""WITH vq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |bx AS (SELECT vq.qid, e.vec_id, unnest(e.embedding) AS a, unnest(vq.qv) AS b
        |       FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> vq.qid),
        |bd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM bx GROUP BY 1, 2),
        |cand AS (SELECT qid, vec_id,
        |    CAST(round(round(dot / (sqrt(na) * sqrt(nb)), 6) * 1000000, 0) AS BIGINT) AS rel6,
        |    rn
        |  FROM (SELECT qid, vec_id, dot, na, nb,
        |          ROW_NUMBER() OVER (PARTITION BY qid
        |            ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS rn
        |        FROM bd) WHERE rn <= $CandK),
        |pe AS (SELECT c.qid, c.vec_id, e.embedding
        |       FROM cand c JOIN embeddings e USING (vec_id)),
        |pxu AS (SELECT a.qid, a.vec_id AS id1, b.vec_id AS id2,
        |          unnest(a.embedding) AS x, unnest(b.embedding) AS y
        |        FROM pe a JOIN pe b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
        |pd AS (SELECT qid, id1, id2, sum(CAST(x AS DOUBLE) * y) AS dot,
        |              sum(CAST(x AS DOUBLE) * x) AS nx, sum(CAST(y AS DOUBLE) * y) AS ny
        |       FROM pxu GROUP BY 1, 2, 3),
        |pairs AS (SELECT qid, id1, id2,
        |    CAST(round(round(dot / (sqrt(nx) * sqrt(ny)), 6) * 1000000, 0) AS BIGINT) AS sim6
        |  FROM pd),
        |sel1 AS (SELECT qid, vec_id, CAST(1 AS BIGINT) AS pick, rel6,
        |    CAST(0 AS BIGINT) AS maxsim6, CAST(rel6 * 7 AS BIGINT) AS mmr10
        |  FROM cand WHERE rn = 1),
        |${(2 to Picks).map(mmrStepSql).mkString(",\n")}
        |SELECT qid, pick, vec_id, rel6, maxsim6, mmr10 FROM sel$Picks
        |""".stripMargin) { (s, dir) =>
      VectorOps.ensure(s)
      TopKBy.register(s)
      val e = table(s, dir, "embeddings")
      val vq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // bounded: 3 queries × CandK rows; checkpointed so the unrolled
      // selection steps never re-scan the corpus
      val cand = SimilarityOps.bruteForceTopK(e, vq, CandK)
        .select(col("qid"), col("vec_id"),
          round(col("cos") * 1000000, 0).cast("long").as("rel6"), col("rn"))
        .localCheckpoint()
      // bounded: ≤ 3 × CandK·(CandK−1) rows; consumed once (collected
      // inside mmrSelect) so no checkpoint needed
      mmrSelect(cand, pairSimsOf(cand, e), Picks)
    },

    // ---- MMR over the FUSED hybrid ranking ---------------------------
    // The composition read a context-budget-aware RAG deployment runs:
    // q_hybrid_retrieval_multi's per-query RRF fusion produces the
    // top-10, and MMR diversifies the 5 that actually enter the
    // context window. Relevance is RANK-derived — rel6 = (11 − rnk)·10⁵
    // — because RRF is itself a rank aggregate, which keeps relevance
    // and the embedding-cosine diversity penalty on one integer scale
    // (the same 7·rel6 − 3·maxsim6 objective as q_retrieval_mmr,
    // selection machinery shared via mmrSelect). Corpus cost is the
    // fused read's own; the diversification adds only candidate-pair
    // cosines (≤ qids·k² rows) and grid-sized argmax steps.
    QDef("q_hybrid_mmr",
      s"""WITH ${Coverage21.lexMultiCtes},
        |${Coverage21.annMultiCtes},
        |${Coverage21.fusedCtes},
        |cand AS (SELECT qid, doc_id AS vec_id,
        |    CAST((11 - rnk) * 100000 AS BIGINT) AS rel6, rnk AS rn
        |  FROM fsel),
        |pe AS (SELECT c2.qid, c2.vec_id, e.embedding
        |       FROM cand c2 JOIN embeddings e ON e.vec_id = c2.vec_id),
        |hpx AS (SELECT a.qid, a.vec_id AS id1, b.vec_id AS id2,
        |          unnest(a.embedding) AS x, unnest(b.embedding) AS y
        |        FROM pe a JOIN pe b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
        |hpd AS (SELECT qid, id1, id2, sum(CAST(x AS DOUBLE) * y) AS dot,
        |               sum(CAST(x AS DOUBLE) * x) AS nx, sum(CAST(y AS DOUBLE) * y) AS ny
        |        FROM hpx GROUP BY 1, 2, 3),
        |pairs AS (SELECT qid, id1, id2,
        |    CAST(round(round(dot / (sqrt(nx) * sqrt(ny)), 6) * 1000000, 0) AS BIGINT) AS sim6
        |  FROM hpd),
        |sel1 AS (SELECT qid, vec_id, CAST(1 AS BIGINT) AS pick, rel6,
        |    CAST(0 AS BIGINT) AS maxsim6, CAST(rel6 * 7 AS BIGINT) AS mmr10
        |  FROM cand WHERE rn = 1),
        |${(2 to Picks).map(mmrStepSql).mkString(",\n")}
        |SELECT qid, pick, vec_id AS doc_id, rel6, maxsim6, mmr10
        |FROM sel$Picks
        |""".stripMargin) { (s, dir) =>
      VectorOps.ensure(s)
      TopKBy.register(s)
      val e = table(s, dir, "embeddings")
      val cand = Coverage21.fusedMulti(s, dir)
        .select(col("qid"), col("doc_id").as("vec_id"),
          ((lit(11L) - col("rnk")) * lit(100000L)).as("rel6"),
          col("rnk").as("rn"))
        .localCheckpoint()
      mmrSelect(cand, pairSimsOf(cand, e), Picks)
        .select(col("qid"), col("pick"), col("vec_id").as("doc_id"),
          col("rel6"), col("maxsim6"), col("mmr10"))
    },

    // ---- ANN tuning curve: recall@10 vs nprobe -----------------------
    // The measurement an IVF deployment tunes its probe budget with:
    // for nprobe ∈ {2, 4, 8}, how many of the exact brute-force top-10
    // does the probed search recover? ONE corpus pass serves all three
    // curve points — candidates are scored once against the full
    // nprobe = 8 probe set with each bucket's probe rank `pr` carried
    // along, and the per-(qid, nprobe) top-10 just filters pr ≤ nprobe
    // before the bounded topk_by aggregate. The brute-force leg is the
    // second and last corpus pass. Fully deterministic → full oracle.
    QDef("q_sim_ann_recall_curve",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
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
        |px AS (SELECT vq.qid, c.cid, unnest(vq.qv) AS a, unnest(c.cv) AS b
        |       FROM vq CROSS JOIN c),
        |pd AS (SELECT qid, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM px GROUP BY 1, 2),
        |probes AS (SELECT qid, cid, pr FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS pr
        |    FROM pd) WHERE pr <= 8),
        |np AS (SELECT CAST(n AS BIGINT) AS nprobe FROM (VALUES (2), (4), (8)) t(n)),
        |cand AS (SELECT p.qid, np.nprobe, a.vec_id
        |         FROM probes p CROSS JOIN np
        |         JOIN assigned a ON a.centroid_id = p.cid
        |         WHERE p.pr <= np.nprobe AND a.vec_id <> p.qid),
        |cx AS (SELECT cand.qid, cand.nprobe, cand.vec_id,
        |         unnest(e.embedding) AS a, unnest(vq.qv) AS b
        |       FROM cand JOIN embeddings e USING (vec_id)
        |       JOIN vq ON vq.qid = cand.qid),
        |cd AS (SELECT qid, nprobe, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM cx GROUP BY 1, 2, 3),
        |r AS (SELECT qid, nprobe, vec_id FROM (
        |    SELECT qid, nprobe, vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY qid, nprobe
        |        ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS rn
        |    FROM cd) WHERE rn <= 10),
        |bx AS (SELECT vq.qid, e.vec_id, unnest(e.embedding) AS a, unnest(vq.qv) AS b
        |       FROM embeddings e CROSS JOIN vq WHERE e.vec_id <> vq.qid),
        |bd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM bx GROUP BY 1, 2),
        |bf AS (SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS brn
        |    FROM bd) WHERE brn <= 10)
        |SELECT r.qid, r.nprobe, CAST(count(b.vec_id) AS BIGINT) AS hits
        |FROM r LEFT JOIN bf b ON b.qid = r.qid AND b.vec_id = r.vec_id
        |GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      VectorOps.ensure(s)
      TopKBy.register(s)
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val vq = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val assigned = SimilarityOps.ivfAssign(e, 97)
      // probe ranks 1..8 per query, carried so every curve point is a
      // FILTER over one scored candidate set, not its own corpus pass
      val probes = vq.crossJoin(broadcast(centroids))
        .withColumn("cd", round(VectorOps.cosine(col("qv"), col("cv")), 6))
        .groupBy(col("qid"))
        .agg(first(col("qv")).as("qv"),
          call_function("topk_by", col("cd"), col("cid"), lit(8)).as("prk"))
        .select(col("qid"), col("qv"), posexplode(col("prk.id")))
        .select(col("qid"), col("qv"), col("col").as("cid"),
          (col("pos") + 1).as("pr"))
      val scored = assigned
        .join(broadcast(probes), assigned("centroid_id") === probes("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
        .select("qid", "vec_id", "cos", "pr")
      val nps = Seq(2, 4, 8).toDF("nprobe")
      val ranked = scored.join(broadcast(nps), col("pr") <= col("nprobe"))
        .groupBy(col("qid"), col("nprobe"))
        .agg(call_function("topk_by", col("cos"), col("vec_id"), lit(10)).as("top"))
        .select(col("qid"), col("nprobe"), explode(col("top.id")).as("vec_id"))
      val bf = SimilarityOps.bruteForceTopK(e, vq, 10)
        .select(col("qid"), col("vec_id")).withColumn("hit", lit(1L))
      ranked.join(bf, Seq("qid", "vec_id"), "left")
        .groupBy(col("qid"), col("nprobe").cast("long").as("nprobe"))
        .agg(count(col("hit")).as("hits"))
    },

    // ---- corpus-prep funnel: which stage rejected each document ------
    // The observability row over q_corpus_prep: every document lands in
    // exactly one disposition — rejected by the quality cut, rejected
    // as an exact duplicate, cut by the per-source token budget, or
    // kept — so the funnel EXPLAINS the flagship's output ("why did my
    // corpus shrink here"). Stage predicates are q_corpus_prep's own
    // (same quantile cut, same md5 dedup key, same PrefixSum budget),
    // so kept-count equality with the flagship is structural, and
    // Coverage22Spec pins it. Scale shape: the disposition frame is two
    // key-partitioned left joins over the stages' own bounded outputs;
    // the result is 4 rows.
    QDef("q_corpus_funnel",
      """WITH m AS (SELECT doc_id, source, text,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha
        |  FROM documents),
        |f AS (SELECT doc_id, source, text,
        |    alpha > (SELECT quantile_cont(alpha, 0.25) FROM m) AS pass_q
        |  FROM m),
        |q AS (SELECT doc_id, source, text FROM f WHERE pass_q),
        |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
        |d AS (SELECT q.doc_id, q.source,
        |        CAST(len(string_split_regex(trim(q.text), '\s+')) AS BIGINT) AS toks,
        |        md5(CAST(q.doc_id AS VARCHAR)) AS ord
        |      FROM q JOIN k USING (doc_id)),
        |c AS (SELECT doc_id,
        |        (sum(toks) OVER (PARTITION BY source ORDER BY ord, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks < 600)
        |          AS in_budget
        |      FROM d),
        |disp AS (SELECT f.doc_id,
        |    CASE WHEN NOT f.pass_q THEN 1
        |         WHEN k.doc_id IS NULL THEN 2
        |         WHEN NOT c.in_budget THEN 3
        |         ELSE 4 END AS stage_id
        |  FROM f LEFT JOIN k ON k.doc_id = f.doc_id
        |  LEFT JOIN c ON c.doc_id = f.doc_id)
        |SELECT CAST(stage_id AS BIGINT) AS stage_id,
        |  CASE stage_id WHEN 1 THEN 'quality_cut' WHEN 2 THEN 'duplicate'
        |       WHEN 3 THEN 'over_budget' ELSE 'kept' END AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM disp GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val m = table(s, dir, "documents").select(
        col("doc_id"), col("source"), col("text"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text"))).as("alpha"))
      val cut = m.agg(expr("percentile(alpha, 0.25)").as("cut"))
      val flagged = m.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("source"), col("text"),
          (col("alpha") > col("cut")).as("pass_q"))
      val q = flagged.filter(col("pass_q"))
      val keep = q.groupBy(md5(lower(trim(col("text"))).cast("binary")))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")).withColumn("is_keep", lit(true))
      val d = q.join(keep.select("doc_id"), Seq("doc_id"), "left_semi").select(
        col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val c = graft.plans.PrefixSum.perKey(d, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("toks"), "cum")
        .select(col("doc_id"), (col("cum") - col("toks") < 600).as("in_budget"))
      flagged
        .join(keep, Seq("doc_id"), "left")
        .join(c, Seq("doc_id"), "left")
        .select(
          when(!col("pass_q"), lit(1L))
            .when(col("is_keep").isNull, lit(2L))
            .when(!col("in_budget"), lit(3L))
            .otherwise(lit(4L)).as("stage_id"))
        .groupBy("stage_id").agg(count(lit(1)).as("n_docs"))
        .select(col("stage_id"),
          element_at(
            array(lit("quality_cut"), lit("duplicate"),
              lit("over_budget"), lit("kept")),
            col("stage_id").cast("int")).as("stage"),
          col("n_docs"))
    },

    // ---- total-variation-distance drift ------------------------------
    // The third member of the drift family (q_ks_drift worst CDF gap,
    // q_chisq_drift significance-weighted distortion): per source, the
    // total variation distance ½·Σ|p_b − q_b| between the source's
    // doc-length distribution and the rest of the corpus — the bounded
    // [0, 1] "what fraction of mass moved" reading a dashboard
    // thresholds directly. UNLIKE its siblings this one needs no
    // doubles AT ALL: ½·Σ|o/n − r/nr| = Σ|o·nr − r·n| / (2·n·nr) with
    // every term an exact bigint cross-product, one integer division
    // at the 10⁶ edge — bit-identical in any engine by construction
    // (no floor-of-double, no decimal-scale trap). Σ|o·nr − r·n| ≤
    // 2·n·nr ≤ ntot²/2, so the 10⁶-scaled numerator stays far inside
    // int64 up to ntot ≈ 10⁹ rows per monitored cohort; beyond that a
    // deployment shards the monitor by cohort, never this sum. Plan:
    // ONE corpus-sized exchange (the shared histogram agg); everything
    // after is |sources| × |grid|.
    QDef("q_drift_tvd",
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS len
        |  FROM documents),
        |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY source, len),
        |cb AS (SELECT len, CAST(sum(c) AS BIGINT) AS cb FROM h GROUP BY len),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY source),
        |ntot AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM h),
        |x AS (
        |  SELECT ns.source, cb.len, cb.cb, ns.n, ntot.ntot,
        |    CAST(coalesce(h.c, 0) AS BIGINT) AS o
        |  FROM ns CROSS JOIN cb CROSS JOIN ntot
        |  LEFT JOIN h ON h.source = ns.source AND h.len = cb.len
        |  WHERE ns.n < ntot.ntot)
        |SELECT source, n,
        |  CAST(CAST(sum(abs(o * (ntot - n) - (cb - o) * n)) AS BIGINT)
        |    * 1000000 // (2 * n * (ntot - n)) AS BIGINT) AS tvd_fp
        |FROM x GROUP BY source, n, ntot ORDER BY source
        |""".stripMargin) { (s, dir) =>
      val h = table(s, dir, "documents")
        .select(col("source"),
          size(split(trim(col("text")), " ")).cast("long").as("len"))
        .groupBy("source", "len")
        .agg(count(lit(1)).cast("long").as("c"))
        .localCheckpoint() // grid-sized; 3 consumers below
      val cb = h.groupBy("len").agg(sum(col("c")).cast("long").as("cb"))
      val ns = h.groupBy("source").agg(sum(col("c")).cast("long").as("n"))
      val nTot = h.agg(sum(col("c")).cast("long").as("ntot"))
      // n < ntot: the single-source guard q_chisq_drift established —
      // a source with no complement has no drift reading
      ns.crossJoin(broadcast(cb)).crossJoin(broadcast(nTot))
        .join(h, Seq("source", "len"), "left")
        .filter(col("n") < col("ntot"))
        .select(col("source"), col("n"), col("ntot"),
          abs(coalesce(col("c"), lit(0L)) * (col("ntot") - col("n"))
            - (col("cb") - coalesce(col("c"), lit(0L))) * col("n")).as("t"))
        .groupBy("source", "n", "ntot")
        .agg(sum(col("t")).as("sad"))
        .select(col("source"), col("n"),
          expr("sad * 1000000 div (2 * n * (ntot - n))").as("tvd_fp"))
        .orderBy("source")
    },

    // ---- LOCF resampling over a date spine ---------------------------
    // The COMPOSITION of q_gapfill (generated date spine, zero-filled
    // counts — Coverage4) and q_locf (IGNORE NULLS forward fill —
    // Coverage8): a daily feature pipeline needs rows for days with no
    // data at all AND a value column carried across those rows, which
    // neither standalone query produces. The spine is keys ×
    // sequence(min_day, max_day) — generated, never scanned — left-
    // joined to the daily aggregate: absent days get n_orders = 0 and
    // carry the last observed daily peak forward (leading nulls stay
    // null, the q_locf convention). Plan: one corpus-sized exchange
    // (the daily agg); the spine, the join's right side, and the LOCF
    // window are all grid-sized (keys × days), so the fill costs the
    // same at any corpus scale with the same calendar span.
    QDef("q_resample_locf",
      """WITH daily AS (
        |  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c, max(o_totalprice) AS peak
        |  FROM orders GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (
        |  SELECT p.priority,
        |    CAST(unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM (SELECT DISTINCT priority FROM daily) p CROSS JOIN b)
        |SELECT s.priority, s.day,
        |  coalesce(d.c, 0) AS n_orders,
        |  last_value(d.peak IGNORE NULLS) OVER (
        |    PARTITION BY s.priority ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_peak
        |FROM spine s LEFT JOIN daily d
        |  ON d.priority = s.priority AND d.day = s.day
        |""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = table(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("c"), max(col("o_totalprice")).as("peak"))
        .localCheckpoint() // grid-sized; feeds bounds, keys, and the join
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = daily.select("priority").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("priority"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy("priority").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.join(daily, Seq("priority", "day"), "left")
        .select(col("priority"), col("day"),
          coalesce(col("c"), lit(0L)).as("n_orders"), col("peak"))
        .withColumn("last_peak", last(col("peak"), ignoreNulls = true).over(w))
        .select("priority", "day", "n_orders", "last_peak")
    }
  )
}
