package graft.operators

import graft._
import graft.functions.{TopKBy, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column:
  * brute-force cosine top-k as the exactness baseline/oracle, IVF
  * (inverted-file) probing as the scale path.
  *
  * Scale design: brute force is O(N) per query but embarrassingly
  * parallel (scan + per-row dot + bounded top-k aggregate). IVF cuts the
  * scanned fraction to nprobe/ncentroids: centroids are a broadcast-side
  * table, assignment is one narrow scan, and each query only reads its
  * probed buckets — at 100 TB the bucket assignment would be the
  * partitioning key so a probe touches only matching files.
  *
  * Every per-group ranking here is a map-side-combinable aggregate, not
  * a `row_number` window: assignment argmax is `max_by` (one row per
  * vector crosses the exchange instead of N·C scored rows) and top-k is
  * the bounded `topk_by` heap aggregate (≤k rows per group per map
  * partition cross the exchange, no sort planned). docs/PLANS.md shows
  * the resulting partial HashAggregate / ObjectHashAggregate plans.
  */
object SimilarityOps {

  private def ensure(df: DataFrame): Unit = {
    VectorOps.ensure(df.sparkSession)
    TopKBy.register(df.sparkSession)
  }

  private def topkBy(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score, id, lit(k))

  /** Explode a `topk_by` result array back to ranked rows
    * (qid, vec_id, cos, rn) — rn is the 1-based rank. */
  private def explodeRanked(grouped: DataFrame): DataFrame =
    grouped
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("long").as("rn"))

  /** All-pairs cosine of `queries` × `corpus`, top-k per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    ensure(corpus)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
    explodeRanked(
      scored.groupBy(col("qid")).agg(topkBy(col("cos"), col("vec_id"), k).as("top")))
  }

  /** IVF index: deterministic centroid sample (vec_id % modulus == 0),
    * every vector assigned to its nearest centroid via the map-side
    * `argmax_by` aggregate — ties broken toward the smallest cid,
    * matching the old window's (d DESC, cid) sort. One ObjectHashAggregate
    * pair, no sort: only one row per vector crosses the exchange.
    * Returns (vec_id, embedding, centroid_id). */
  def ivfAssign(corpus: DataFrame, modulus: Int): DataFrame =
    ivfAssignTo(corpus, corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv")))

  /** [[ivfAssign]] against a caller-supplied (cid, cv) centroid table —
    * the form the k-means-trained index uses, where centroids are Lloyd
    * outputs rather than a corpus sample. */
  def ivfAssignTo(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    ensure(corpus)
    // scores rounded to 6 before ranking (like every cosine output in
    // the engine): cross-engine double sums agree at that scale, which
    // is what lets DuckDB recompute the assignment exactly
    corpus.crossJoin(broadcast(centroids))
      .withColumn("d", round(VectorOps.cosine(col("embedding"), col("cv")), 6))
      .groupBy(col("vec_id"))
      .agg(call_function("argmax_by",
        struct(col("cid"), col("embedding")), col("d"), col("cid")).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cid").as("centroid_id"))
  }

  /** ANN search: probe the `nprobe` nearest centroids per query (bounded
    * `topk_by` aggregate), exact cosine only within those buckets. */
  def ivfSearch(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    ensure(assigned)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .groupBy(col("qid"))
      .agg(first(col("qv")).as("qv"),
        topkBy(col("cd"), col("cid"), nprobe).as("pr"))
      .select(col("qid"), col("qv"), explode(col("pr.id")).as("cid"))
    // probes is #queries × nprobe rows — broadcast so bucket lookup is a
    // map-side hash join (no shuffle/sort of the assigned corpus).
    val scored = assigned.join(broadcast(probes), assigned("centroid_id") === probes("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
    explodeRanked(
      scored.groupBy(col("qid")).agg(topkBy(col("cos"), col("vec_id"), k).as("top")))
  }

  /** Int8 RESIDUAL quantization of an assigned corpus (the SQ8 coding
    * step): r = x − centroid, per-vector scale = 127/max|rᵢ|, codes =
    * ⌊rᵢ·scale + 0.5⌋ — q_embed_quantize's deterministic arithmetic
    * applied to residuals, which is what makes the codes SMALL (a
    * vector near its centroid has a tiny residual range, so the 8-bit
    * grid is dense exactly where the mass is). A zero residual (the
    * centroid vector itself) stores scale 0 / codes 0 and
    * reconstructs to the centroid exactly. Returns (vec_id,
    * centroid_id, sc, codes) — ~dim bytes of payload per vector
    * instead of 4·dim: the memory-bounded form a 100-TB vector corpus
    * needs (raw floats don't fit; codes do). */
  def sq8Codes(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), col("centroid_id") === col("cid"))
      .withColumn("r", expr(
        "zip_with(embedding, cv, (x, c) -> CAST(x AS DOUBLE) - CAST(c AS DOUBLE))"))
      .withColumn("maxabs", expr(
        "aggregate(r, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(x)))"))
      .withColumn("sc", when(col("maxabs") > 0,
        lit(127.0) / col("maxabs")).otherwise(lit(0.0)))
      .select(col("vec_id"), col("centroid_id"), col("sc"),
        expr("transform(r, x -> CAST(floor(x * sc + 0.5D) AS BIGINT))")
          .as("codes"))

  /** IVF-SQ8 search — asymmetric distance computation + exact re-rank:
    * probes select nprobe centroids per query on TRUE centroid
    * vectors; candidates in probed buckets are scored with the
    * full-precision query against their int8-RECONSTRUCTED form
    * (x̂ = centroid + codes/scale — classic ADC); the top k·refine
    * shortlist per query is re-ranked EXACTLY against true
    * embeddings. Only the shortlist ever touches a float vector —
    * the scan side reads codes. Every ranking edge is
    * 6-digit-rounded with id tie-breaks, so the whole pipeline is
    * deterministic and DuckDB-recomputable (q_sim_ann_ivfsq8). */
  def ivfSq8Search(codes: DataFrame, centroids: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, refine: Int): DataFrame = {
    ensure(corpus)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .groupBy(col("qid"))
      .agg(first(col("qv")).as("qv"),
        topkBy(col("cd"), col("cid"), nprobe).as("pr"))
      .select(col("qid"), col("qv"), explode(col("pr.id")).as("cid"))
    // Probe-filter BEFORE reconstructing (round-14, guide §1.2 "don't
    // compute things you throw away"): the previous shape decoded xhat
    // for EVERY corpus row and only then joined the probe list — the
    // reconstruction zip_with (an interpreted HOF lambda, 64 elements/
    // row) ran over all N codes where only the probed buckets'
    // (~nprobe/|centroids| of the corpus) ever reach the scorer. Same
    // joins, same arithmetic, same rows — just ordered so the decode
    // runs after the candidate cut.
    val appx = codes.join(broadcast(probes),
        codes("centroid_id") === probes("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(
        centroids.select(col("cid").as("rcid"), col("cv"))),
        col("centroid_id") === col("rcid"))
      .withColumn("xhat", expr(
        """zip_with(cv, codes, (c, qc) -> CAST(c AS DOUBLE) +
          | (CASE WHEN sc = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
          |  ELSE qc / sc END))""".stripMargin))
      .withColumn("ap", round(VectorOps.cosine(col("xhat"), col("qv")), 6))
    val shortlist = appx.groupBy(col("qid"))
      .agg(topkBy(col("ap"), col("vec_id"), k * refine).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    val exact = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
    explodeRanked(
      exact.groupBy(col("qid")).agg(topkBy(col("cos"), col("vec_id"), k).as("top")))
  }

  /** The SQ8 query was declared as `q_sim_ann_ivfpq` through round 13;
    * the honest rename keeps the old name alive as an alias (same fn,
    * same oracle SQL) because the driver contract forbids removing or
    * renaming a declared query. */
  val defs: Seq[QDef] = {
    val base = baseDefs
    base :+ base.find(_.name == "q_sim_ann_ivfsq8").get
      .copy(name = "q_sim_ann_ivfpq")
  }

  private def baseDefs: Seq[QDef] = Seq(

    // Brute-force cosine top-10 for one query vector.
    QDef("q_sim_topk",
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |x AS (SELECT e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |d AS (SELECT vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |             sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |      FROM x GROUP BY vec_id)
        |SELECT vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
        |FROM d ORDER BY cos DESC, vec_id LIMIT 10
        |""".stripMargin) { (s, dir) =>
      VectorOps.ensure(s)
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(VectorOps.cosine(col("embedding"), col("qv")), 6).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },

    // Brute-force top-3 neighbors for each of the first 5 query vectors.
    QDef("q_sim_topk_multi",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |x AS (SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |d AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |             sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |      FROM x GROUP BY qid, vec_id),
        |sc AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM d),
        |r AS (SELECT qid, vec_id, cos,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
        |      FROM sc)
        |SELECT qid, vec_id, cos, rn FROM r WHERE rn <= 3
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      bruteForceTopK(e, q, 3)
    },

    // IVF-probed ANN (scale path). Approximate relative to brute force
    // (recall measured in DedupSimSpec) but fully DETERMINISTIC as a
    // function of the corpus — centroid sample, argmax assignment,
    // probe ranking, and final top-k all rank on 6-digit-rounded
    // cosines with id tie-breaks — so DuckDB recomputes the entire
    // index + search and the driver hash-compares it.
    QDef("q_sim_ann_ivf",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
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
        |r AS (SELECT qid, vec_id, cos,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
        |      FROM sc)
        |SELECT qid, vec_id, cos, rn FROM r WHERE rn <= 10
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ivfSearch(ivfAssign(e, 97), centroids, q, 10, 8)
    },

    // IVF-SQ8: quantized ANN — int8 residual codes per centroid bucket,
    // asymmetric reconstruction scoring, exact re-rank of the top
    // k·refine shortlist (k=10, refine=3, nprobe=8). The memory-
    // bounded form a 100-TB vector corpus needs (IvfIndex.buildSq8
    // persists this layout; IvfSq8Spec measures recall vs the
    // unquantized search). All arithmetic is floor-quantized integers
    // + fixed-order IEEE ops with 6-digit ranking edges, so DuckDB
    // recomputes coding, probing, shortlist, and re-rank exactly.
    QDef("q_sim_ann_ivfsq8",
      """WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id % 97 = 0),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
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
        |pq AS (
        |  SELECT vec_id, centroid_id, r,
        |    CASE WHEN list_max(list_transform(r, x -> abs(x))) > 0
        |         THEN 127.0 / list_max(list_transform(r, x -> abs(x))) ELSE 0.0 END AS sc
        |  FROM res),
        |codes AS (SELECT vec_id, centroid_id, sc,
        |    list_transform(r, x -> CAST(floor(x * sc + 0.5) AS BIGINT)) AS q8 FROM pq),
        |px AS (SELECT q.qid, c.cid, unnest(q.qv) AS a, unnest(c.cv) AS b
        |       FROM q CROSS JOIN c),
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
        |  SELECT p.qid, r.vec_id, unnest(r.xhat) AS a, unnest(q.qv) AS b
        |  FROM probes p
        |  JOIN recon r ON r.centroid_id = p.cid
        |  JOIN q ON q.qid = p.qid
        |  WHERE r.vec_id <> p.qid),
        |appxd AS (SELECT qid, vec_id, sum(a * CAST(b AS DOUBLE)) AS dot,
        |              sum(a * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM appxu GROUP BY 1, 2),
        |shortlist AS (SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, vec_id) AS ar
        |    FROM appxd) WHERE ar <= 30),
        |cx AS (SELECT sl.qid, sl.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |       FROM shortlist sl JOIN embeddings e ON e.vec_id = sl.vec_id
        |       JOIN q ON q.qid = sl.qid),
        |cd AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM cx GROUP BY 1, 2),
        |sc2 AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM cd),
        |r2 AS (SELECT qid, vec_id, cos,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
        |      FROM sc2)
        |SELECT qid, vec_id, cos, rn FROM r2 WHERE rn <= 10
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ivfSq8Search(sq8Codes(ivfAssign(e, 97), centroids), centroids,
        e, q, k = 10, nprobe = 8, refine = 3)
    },

    // Hard-negative mining: for each query vector, the top-3 most
    // similar vectors carrying a DIFFERENT label — the contrastive-
    // training companion of q_sim_topk_multi (the nearest neighbors
    // you must NOT collapse onto). Same brute-force cosine/ranking
    // conventions (6-digit round, id tie-break); the label filter
    // also excludes self (same vector ⇒ same label). The query set
    // rides broadcast; candidates never shuffle — per-query top-k is
    // the map-side `topk_by` partial agg, so only k rows per query
    // cross the exchange.
    QDef("q_hard_negatives",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        |           FROM embeddings WHERE vec_id < 8),
        |x AS (SELECT q.qid, e.vec_id, unnest(e.embedding) AS a, unnest(q.qv) AS b
        |      FROM embeddings e JOIN q ON e.label <> q.qlabel),
        |d AS (SELECT qid, vec_id, sum(CAST(a AS DOUBLE) * b) AS dot,
        |             sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |      FROM x GROUP BY qid, vec_id),
        |sc AS (SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM d),
        |r AS (SELECT qid, vec_id, cos,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS BIGINT) AS rn
        |      FROM sc)
        |SELECT qid, vec_id, cos, rn FROM r WHERE rn <= 3
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      ensure(e)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("label") =!= col("qlabel"))
        .withColumn("cos",
          round(VectorOps.cosine(col("embedding"), col("qv")), 6))
      explodeRanked(scored.groupBy(col("qid"))
        .agg(topkBy(col("cos"), col("vec_id"), 3).as("top")))
    },

    // Truncated-dimension quality curve: top-10 cosine neighbors of
    // query 0 computed on the FIRST d dims (d ∈ 8,16,32,64) and the
    // overlap of each truncated top-10 with the full-dim top-10 — the
    // measurement behind "how many dims do we actually have to store"
    // (Matryoshka-style prefix truncation: at 100 TB, a d/64 prefix
    // scan is a d/64 I/O bill). One scan; the per-dim ranking is the
    // map-side topk_by; the overlap join is 10×4 rows.
    QDef("q_sim_dim_curve",
      """WITH dims AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS dim),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |x AS (SELECT d.dim, e.vec_id,
        |        unnest(e.embedding) AS a, unnest(q.qv) AS b,
        |        generate_subscripts(e.embedding, 1) AS i
        |      FROM embeddings e CROSS JOIN q CROSS JOIN dims d
        |      WHERE e.vec_id <> 0),
        |dd AS (SELECT dim, vec_id,
        |         sum(CASE WHEN i <= dim THEN CAST(a AS DOUBLE) * b ELSE 0 END) AS dot,
        |         sum(CASE WHEN i <= dim THEN CAST(a AS DOUBLE) * a ELSE 0 END) AS na,
        |         sum(CASE WHEN i <= dim THEN CAST(b AS DOUBLE) * b ELSE 0 END) AS nb
        |       FROM x GROUP BY dim, vec_id),
        |sc AS (SELECT dim, vec_id,
        |         round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos FROM dd),
        |r AS (SELECT dim, vec_id,
        |        ROW_NUMBER() OVER (PARTITION BY dim
        |          ORDER BY cos DESC, vec_id) AS rn
        |      FROM sc),
        |top AS (SELECT dim, vec_id FROM r WHERE rn <= 10),
        |full_top AS (SELECT vec_id FROM top WHERE dim = 64)
        |SELECT t.dim,
        |  CAST(count(f.vec_id) AS BIGINT) AS hits,
        |  CAST(count(*) AS BIGINT) AS k
        |FROM top t LEFT JOIN full_top f ON f.vec_id = t.vec_id
        |GROUP BY t.dim ORDER BY t.dim
        |""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "embeddings")
      ensure(e)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val dims = s.range(1).select(
        explode(array(Seq(8, 16, 32, 64).map(d => lit(d.toLong)): _*)).as("dim"))
      val scored = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)).crossJoin(broadcast(dims))
        .withColumn("cos", round(VectorOps.cosine(
          slice(col("embedding"), lit(1), col("dim").cast("int")),
          slice(col("qv"), lit(1), col("dim").cast("int"))), 6))
      val top = scored.groupBy(col("dim"))
        .agg(topkBy(col("cos"), col("vec_id"), 10).as("top"))
        .select(col("dim"), explode(col("top.id")).as("vec_id"))
        .localCheckpoint()
      val fullTop = top.filter(col("dim") === 64)
        .select(col("vec_id").as("fid"))
      top.join(broadcast(fullTop), col("vec_id") === col("fid"), "left")
        .groupBy("dim")
        .agg(count(col("fid")).cast("long").as("hits"),
          count(lit(1)).cast("long").as("k"))
        .orderBy("dim")
    },
  )
}
