package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension wave: scale-hardening variants and new coverage.
  *
  * q_dedup_containment_capped is the round-6 verdict #2 fix made
  * first-class: the exact shingle-join anchors generate candidate pairs
  * by self-join on shared shingle, so a single hot shingle (license
  * boilerplate, navigation chrome) costs df² pairs. Capping document
  * frequency at 256 BEFORE the join bounds the blow-up at
  * maxDf · Σ df — linear in corpus size — while the oracle stays exact
  * because the identical cap runs in both engines' SQL
  * (DedupOps.shingleCappedOracleCtes). On this corpus the cap is
  * a no-op semantically (no shingle reaches df 256 at any verified
  * scale), which is precisely what makes the capped row's green
  * CORRECTNESS meaningful: same answer, bounded worst case.
  * DedupCapSpec measures the candidate-pair reduction on a planted
  * hot-shingle corpus (200 docs sharing one boilerplate sentence).
  */
object Coverage11 {

  /** Majority vote over a ranked neighbor table (qid, vec_id, cos, rn):
    * join labels, count votes, pick (votes DESC, label ASC) — shared by
    * the brute-force and IVF kNN classifiers so the two variants can
    * never drift in vote semantics. */
  private def voteLabels(neighbors: org.apache.spark.sql.DataFrame,
      labeled: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wp = Window.partitionBy("qid").orderBy(col("votes").desc, col("label"))
    neighbors
      .join(labeled.select(col("vec_id"), col("label")), "vec_id")
      .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
  }

  /** The shared SQL vote tail over a scored-candidates CTE `sc`
    * (qid, vec_id, cos) — the oracle twin of [[voteLabels]]. */
  private val voteTailSql =
    """r AS (SELECT qid, vec_id, cos,
      |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      |      FROM sc),
      |n AS (SELECT r.qid, e.label FROM r JOIN embeddings e ON e.vec_id = r.vec_id
      |      WHERE rn <= 5),
      |v AS (SELECT qid, label, count(*) AS votes FROM n GROUP BY 1, 2),
      |p AS (SELECT qid, label, votes,
      |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS pr FROM v)
      |SELECT qid, label AS pred_label, CAST(votes AS BIGINT) AS votes
      |FROM p WHERE pr = 1""".stripMargin

  val defs: Seq[QDef] = Seq(

    // DF-capped asymmetric containment dedup: identical semantics to
    // q_dedup_containment on corpora without hot shingles, bounded
    // candidate generation on corpora with them. The cap (df ≤ 256) is
    // applied to the shingle REPRESENTATION (sizes recomputed over the
    // capped sets), not just the join — self-consistent containment
    // over capped sets, the standard support-threshold move.
    QDef("q_dedup_containment_capped",
      s"""WITH ${DedupOps.shingleCappedOracleCtes(256)}
        |SELECT d1, d2,
        |       round(CAST(inter AS DOUBLE) / least(s1.n, s2.n), 6) AS containment
        |FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(CAST(inter AS DOUBLE) / least(s1.n, s2.n), 6) >= 0.9
        |""".stripMargin) { (s, dir) =>
      val sh = DedupOps.shingles(table(s, dir, "documents"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      DedupOps.containmentPairs(DedupOps.dfCappedShingles(sh, 256), 0.9)
    },

    // ---- deterministic epoch shuffle (global rank, distributed) -----------
    // Each document's position in the md5-keyed total order — the
    // reproducible random read order a training run uses per epoch.
    // The oracle is the obvious single window; the engine runs
    // plans.ShuffleRank: 256 leading-byte buckets, prefix offsets over
    // the ≤256-row count table (the only unpartitioned window), rank =
    // offset + intra-bucket row_number — a PARTITIONED window, so no
    // task ever sorts more than ~1/256 of the corpus at any scale.
    QDef("q_shuffle_det",
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))) - 1
        |    AS BIGINT) AS pos
        |FROM documents
        |""".stripMargin) { (s, dir) =>
      graft.plans.ShuffleRank.rank(
        table(s, dir, "documents").select("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")), "pos")
        .select("doc_id", "pos")
    },

    // ---- corpus-wide top-k n-grams ----------------------------------------
    // Vocabulary / boilerplate analysis staple: the 20 most frequent
    // word bigrams with a total-order tie-break (count DESC, bigram
    // ASC). Aggregation partial-combines map-side on the bigram; the
    // top-k is TakeOrderedAndProject over the aggregated table — per-
    // partition heaps + a k-row driver merge, never a global sort.
    QDef("q_top_ngrams",
      """WITH toks AS (SELECT string_split(trim(text), ' ') AS w FROM documents),
        |idx AS (SELECT w, generate_subscripts(w, 1) AS i FROM toks WHERE len(w) >= 2),
        |bg AS (SELECT w[i] || ' ' || w[i+1] AS bigram FROM idx WHERE i <= len(w) - 1)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS n
        |FROM bg GROUP BY 1
        |ORDER BY n DESC, bigram LIMIT 20
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1]))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
    },

    // ---- duplicate-cluster size histogram ---------------------------------
    // The dedup report's headline table: how many duplicate clusters
    // of each size the corpus contains. Composes the memoized LSH
    // pair set → connected components (same labels as
    // q_dedup_clusters) → two bounded aggregations; everything after
    // the CC fixpoint shuffles O(#duplicate docs) rows only.
    // ---- cross-source duplicate overlap matrix ----------------------------
    // Mixture-design staple: which sources duplicate which — the count
    // of near-dup pairs (jaccard ≥ 0.8, the suite's shared verified
    // pair set) per unordered source pair. Consumes the memoized LSH
    // pair set (O(duplicates) rows), joins the tiny (doc_id, source)
    // map broadcast, and aggregates into a ≤|sources|² matrix — every
    // stage after pair-finding is bounded by dup count, not corpus
    // size.
    QDef("q_source_overlap",
      s"""WITH ${DedupOps.shingleOracleCtes},
        |dup AS (SELECT d1, d2
        |        FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
        |        WHERE round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) >= 0.8),
        |src AS (SELECT doc_id, source FROM documents)
        |SELECT least(a.source, b.source) AS src1,
        |       greatest(a.source, b.source) AS src2,
        |       CAST(count(*) AS BIGINT) AS n_pairs
        |FROM dup JOIN src a ON a.doc_id = d1 JOIN src b ON b.doc_id = d2
        |GROUP BY 1, 2
        |""".stripMargin) { (s, dir) =>
      val src = table(s, dir, "documents").select(col("doc_id"), col("source"))
      DedupOps.verifiedPairsFor(s, dir, 0.8)
        .join(src.select(col("doc_id").as("d1"), col("source").as("sa")), "d1")
        .join(src.select(col("doc_id").as("d2"), col("source").as("sb")), "d2")
        .select(least(col("sa"), col("sb")).as("src1"),
          greatest(col("sa"), col("sb")).as("src2"))
        .groupBy("src1", "src2").agg(count(lit(1)).as("n_pairs"))
    },

    // ---- per-source token-budget sampling ---------------------------------
    // A training-mixture staple: from each source, take documents in
    // the reproducible md5 order until the source's token budget is
    // reached (greedy prefix — a doc is in iff the running total
    // BEFORE it is under budget, so every source lands within one doc
    // of its quota). The oracle is the obvious per-source cumulative
    // window; the engine runs plans.PrefixSum — two-phase segmented
    // running totals (256 leading-byte buckets, offsets over a ≤256-row
    // per-key count table, intra-bucket windows) — so no task ever
    // scans more than ~1/256 of a source's rows regardless of how few
    // sources the corpus has.
    QDef("q_token_budget",
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |c AS (SELECT doc_id, source, toks,
        |    sum(toks) OVER (PARTITION BY source ORDER BY ord, doc_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, toks, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum - toks < 600
        |""".stripMargin) { (s, dir) =>
      val t = table(s, dir, "documents").select(
        col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      graft.plans.PrefixSum.perKey(t, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("toks"), "cum")
        .filter(col("cum") - col("toks") < 600)
        .select(col("doc_id"), col("source"), col("toks"),
          col("cum").as("cum_tokens"))
    },

    // ---- eval-set n-gram coverage -----------------------------------------
    // The memorization-risk twin of q_decontaminate (same 8-gram
    // representation, same doc_id%10 eval split): per eval document,
    // the fraction of its distinct 8-grams that appear ANYWHERE in the
    // training split. Decontaminate lists pairwise offenders;
    // coverage summarizes per-eval-doc exposure. The train side
    // reduces to DISTINCT grams before the join (one corpus-sized
    // aggregation, then a gram-keyed left join that AQE sizes), and
    // the output is one row per eval doc.
    QDef("q_ngram_coverage",
      """WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
        |f AS (SELECT doc_id, w FROM toks WHERE len(w) >= 8),
        |idx AS (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM f),
        |g AS (SELECT DISTINCT doc_id,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
        |        w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS g
        |      FROM idx WHERE i <= len(w) - 7),
        |ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % 10 = 0),
        |tr AS (SELECT DISTINCT g FROM g WHERE doc_id % 10 <> 0)
        |SELECT eval_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(tr.g) AS BIGINT) AS n_covered,
        |       round(CAST(count(tr.g) AS DOUBLE) / count(*), 6) AS coverage
        |FROM ev LEFT JOIN tr ON ev.g = tr.g
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val grams = table(s, dir, "documents")
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(0, size(w) - 8), i -> concat_ws(' ', " +
            (0 until 8).map(k => s"w[i + $k]").mkString(", ") + "))"
        ))).as("g"))
      val ev = grams.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("g"))
      val tr = grams.filter(col("doc_id") % 10 =!= 0)
        .select("g").distinct().withColumn("hit", lit(1))
      ev.join(tr, Seq("g"), "left")
        .groupBy("eval_id")
        .agg(count(lit(1)).as("n_grams"),
          count(col("hit")).as("n_covered"),
          round(count(col("hit")).cast("double") / count(lit(1)), 6)
            .as("coverage"))
    },

    // ---- kNN majority-vote classification ---------------------------------
    // Label propagation / weak-labelling primitive: each query vector
    // takes the majority label of its 5 nearest neighbors (rounded
    // cosine, vec_id tie-break; vote ties break toward the smaller
    // label). Neighbor search is the map-side topk_by heap aggregate
    // (bruteForceTopK — no global sort, one row per (query, neighbor)
    // crosses the exchange); the vote is two bounded aggregations over
    // 5·|queries| rows. IVF swaps in for the brute-force scorer at
    // scale exactly as in q_sim_ann_ivf.
    QDef("q_knn_classify",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
        |x AS (SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |d AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |             sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |      FROM x GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM d),
        |$voteTailSql
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      voteLabels(SimilarityOps.bruteForceTopK(e, q, 5), e)
    },

    // ---- kNN classification, IVF scale path -------------------------------
    // The same 5-NN majority vote riding the IVF probe search instead
    // of brute force — candidates come from the 8 nearest centroid
    // buckets only, so scoring cost is corpus/centroids × nprobe per
    // query instead of corpus per query. Fully deterministic like
    // q_sim_ann_ivf (6-digit rounded cosines, id tie-breaks at every
    // rank), so DuckDB recomputes index + probe + vote and the driver
    // hash-compares. Approximate vs q_knn_classify only when a true
    // neighbor lives outside the probed buckets.
    QDef("q_knn_classify_ivf",
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
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
        |px AS (SELECT q.qid, c.cid, unnest(q.qv) AS a, unnest(c.cv) AS b
        |       FROM q CROSS JOIN c),
        |pd AS (SELECT qid, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM px GROUP BY 1, 2),
        |probes AS (SELECT qid, cid FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS pr
        |    FROM pd) WHERE pr <= 8),
        |cand AS (SELECT p.qid, a.vec_id FROM probes p
        |         JOIN assigned a ON a.centroid_id = p.cid WHERE a.vec_id <> p.qid),
        |cx AS (SELECT cand.qid, cand.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |       FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
        |       JOIN q ON q.qid = cand.qid),
        |cd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM cx GROUP BY 1, 2),
        |sc AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM cd),
        |$voteTailSql
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      voteLabels(SimilarityOps.ivfSearch(
        SimilarityOps.ivfAssign(e, 97), centroids, q, 5, 8), e)
    },

    // ---- end-to-end corpus preparation ------------------------------------
    // The pipeline flagship: quality filter (bottom-quartile
    // alpha-ratio cut) → exact dedup (keep min doc_id per normalized
    // text hash) → per-source token-budget sample, composed as ONE
    // declarative plan — Catalyst sees all three stages at once, so
    // column pruning reaches the scan (only doc_id/source/text/lang
    // read) and the dedup semi-join + budget window pipeline without
    // materialization boundaries. The quantile cutoff is a broadcast
    // 1-row aggregate (no driver collect); dedup is one hash groupBy +
    // left-semi; the budget runs plans.PrefixSum. Every stage's
    // standalone twin is its own oracle row (q_quality_filter,
    // q_dedup_docs_exact, q_token_budget) — this row pins the
    // COMPOSITION.
    QDef("q_corpus_prep",
      """WITH m AS (SELECT doc_id, source, text,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha
        |  FROM documents),
        |q AS (SELECT doc_id, source, text FROM m
        |      WHERE alpha > (SELECT quantile_cont(alpha, 0.25) FROM m)),
        |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
        |d AS (SELECT q.doc_id, q.source,
        |        CAST(len(string_split_regex(trim(q.text), '\s+')) AS BIGINT) AS toks,
        |        md5(CAST(q.doc_id AS VARCHAR)) AS ord
        |      FROM q JOIN k USING (doc_id)),
        |c AS (SELECT doc_id, source, toks,
        |        sum(toks) OVER (PARTITION BY source ORDER BY ord, doc_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM d)
        |SELECT doc_id, source, toks, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum - toks < 600
        |""".stripMargin) { (s, dir) =>
      // round-14 (guide §1.2/§2.4): checkpoint the alpha projection so
      // the quality-cut scan runs once; dedup via ONE keyed window
      // instead of groupBy + semi join-back; narrow checkpoint before
      // PrefixSum's two-phase double consumption. Same rows at every
      // stage (the Coverage17 prep-chain treatment).
      val m = table(s, dir, "documents").select(
        col("doc_id"), col("source"), col("text"),
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double")
          / length(col("text"))).as("alpha"))
        .localCheckpoint()
      val cut = m.agg(expr("percentile(alpha, 0.25)").as("cut"))
      val q = m.crossJoin(broadcast(cut)).filter(col("alpha") > col("cut"))
        .select("doc_id", "source", "text")
      val d = q.withColumn("_keep_id", min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(
            md5(lower(trim(col("text"))).cast("binary")))))
        .filter(col("doc_id") === col("_keep_id"))
        .select(
          col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
        .localCheckpoint()
      graft.plans.PrefixSum.perKey(d, "source",
          md5(col("doc_id").cast("string").cast("binary")), "doc_id",
          col("toks"), "cum")
        .filter(col("cum") - col("toks") < 600)
        .select(col("doc_id"), col("source"), col("toks"),
          col("cum").as("cum_tokens"))
    },

    QDef("q_dedup_cluster_sizes",
      s"""WITH RECURSIVE
        |${DedupOps.shingleOracleCtes},
        |${DedupOps.reachOracleCtes}
        |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        |FROM (SELECT canonical, CAST(count(*) AS BIGINT) AS sz
        |      FROM (SELECT id, min(r) AS canonical FROM reach GROUP BY id)
        |      GROUP BY canonical)
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      DedupOps.clusterLabelsFor(s, dir, 0.8)
        .groupBy("canonical").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    },
  )
}
