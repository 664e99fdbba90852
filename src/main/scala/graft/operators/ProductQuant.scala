package graft.operators

import graft._
import graft.functions.{TopKBy, VecSum, VectorOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRUE product quantization for the IVF ANN index (round-13 verdict
  * #1): the residual of each assigned vector is split into `m`
  * subvectors, each subspace gets its own K-entry codebook (K ≤ 256 —
  * ONE BYTE per subvector), trained by the engine's deterministic
  * seeded-Lloyd machinery (the q_sim_ann_ivf_trained move, per
  * subspace), and every vector stores just `m` codebook indices.
  * Search scores candidates with ADC LOOKUP TABLES: per query, one
  * m×K table of precomputed subvector dot products — a candidate's
  * approximate score is `m` table lookups, no float vector is read
  * until the exact re-rank shortlist.
  *
  * Storage math this buys (the claim SQ8 — [[SimilarityOps.sq8Codes]]
  * — could not make): SQ8 stores dim bytes/vector; PQ stores m
  * bytes/vector plus an m×K×subDim codebook that is index metadata
  * (broadcast-sized, shared by the whole corpus). At m=8 on a 100-TB
  * fp32 corpus that is ~3 TB of codes vs SQ8's 25 TB; see [[M]] for
  * why THIS corpus pins m=32 (still 2× under SQ8, 8× under fp32).
  *
  * Determinism (the full-DuckDB-oracle contract, q_sim_ann_pq):
  *  - codebook seeds are the deterministic `vec_id % cbMod` residual
  *    sample, densely renumbered 0..K−1 by vec_id order;
  *  - Lloyd under L2 on 6-digit-rounded distances, smallest-code
  *    tie-break; means rounded to 6 (the engine's convention); a
  *    codeword that loses every member keeps its seed position;
  *  - ADC is INTEGER-EXACT: every table entry is the fixed-point
  *    `floor(dot·10⁶)` (the q_chisq_drift idiom — floor of an
  *    identical IEEE double is unambiguous in every engine) and the
  *    candidate score is a bigint sum, so the shortlist ranking has
  *    no cross-engine float hazard at all;
  *  - the exact re-rank is the standard 6-digit cosine with id
  *    tie-breaks, shared with every other similarity query.
  *
  * Scale shape: training touches the corpus twice (assign + means)
  * over map-side-combinable aggregates; encoding is one broadcast
  * join + one bounded hash agg; search reads ONLY probed buckets of
  * the m-byte code table, the per-query lookup tables ride a
  * broadcast, the ADC sum is a codegen-friendly `aggregate(zip_with)`
  * over two small arrays, and floats are touched only for the
  * k·refine shortlist.
  */
object ProductQuant {

  private def ensure(df: DataFrame): Unit = {
    VectorOps.ensure(df.sparkSession)
    TopKBy.register(df.sparkSession)
    VecSum.register(df.sparkSession)
  }

  private def topkBy(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score, id, lit(k))

  /** Fixed-point quantum for ADC table entries. */
  val FP = 1000000L

  /** (vec_id, centroid_id, r): the assigned corpus's residuals —
    * identical arithmetic to the SQ8 coder's residual step. */
  def residuals(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), col("centroid_id") === col("cid"))
      .withColumn("r", expr(
        "zip_with(embedding, cv, (x, c) -> CAST(x AS DOUBLE) - CAST(c AS DOUBLE))"))
      .select(col("vec_id"), col("centroid_id"), col("r"))

  /** Explode residuals into per-subspace rows (vec_id, centroid_id,
    * sub, rs) — sub ∈ 0..m−1, rs = the sub-th dim/m-slice of r. */
  def subvectors(res: DataFrame, m: Int): DataFrame = {
    val spark = res.sparkSession
    val subsDf = spark.range(m).select(col("id").as("sub"))
    val subDim = size(col("r")) / m
    res.crossJoin(broadcast(subsDf))
      .select(col("vec_id"), col("centroid_id"), col("sub"),
        slice(col("r"), (col("sub") * subDim + 1).cast("int"),
          subDim.cast("int")).as("rs"))
  }

  /** [[subvectors]] ∘ [[residuals]] with the slice applied to the
    * OPERANDS instead of the subtraction's result — element-wise
    * identical (slice commutes with zip_with), and the hot-path form
    * train/encode use.
    *
    * Round-14 optimization (guide §1.2 step 2 "per-task work"): in the
    * composed form, Catalyst's projection collapse inlined the FULL
    * dim-element interpreted `zip_with` subtraction into every
    * (vec, sub) row — the whole residual recomputed m times per vector
    * (measured as the dominant CPU of both train and encode, ~15–25
    * CPU-s each at sf0.1). Subtracting the dim/m-element slices leaves
    * the interpreted lambda touching 2 elements per row. Equality with
    * the composed form is pinned in ProductQuantSpec. */
  def subvectorsOf(assigned: DataFrame,
      centroids: DataFrame, m: Int): DataFrame = {
    val spark = assigned.sparkSession
    val subsDf = spark.range(m).select(col("id").as("sub"))
    val subDim = size(col("embedding")) / m
    val start = (col("sub") * subDim + 1).cast("int")
    val len = subDim.cast("int")
    // Spread the per-row-heavy argmin work ONLY when the input is
    // under-parallel (e.g. a one-file parquet scan, whose single task
    // AQE's byte-count heuristic would serialize — the q_fuzzy_match
    // lesson): a checkpointed assignment already carries the session's
    // shuffle-partition layout, and re-exchanging it per train/encode
    // pass was pure overhead (guide §2.4 — remove shuffles outright).
    val width = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base =
      if (assigned.rdd.getNumPartitions < width)
        assigned.repartition(width, col("vec_id"))
      else assigned
    base.join(broadcast(centroids), col("centroid_id") === col("cid"))
      .crossJoin(broadcast(subsDf))
      .select(col("vec_id"), col("centroid_id"), col("sub"),
        zip_with(slice(col("embedding"), start, len),
          slice(col("cv"), start, len),
          (x, c) => x.cast("double") - c.cast("double")).as("rs"))
  }

  /** Nearest codeword per (vec_id, sub) under L2 — round-6 distance,
    * smallest-code tie-break. Round-14 optimization (guide §2.3/§2.4 +
    * §1.2 "per-task work"): the previous shape broadcast-joined every
    * subvector row against all K codeword ROWS (N·m·K rows through the
    * operator pipeline — 16.4M at sf0.1 even after the fan-out was
    * kept map-side by `min_by`) and still paid a groupBy exchange to
    * reduce the argmin. Now the codebooks are PACKED per subspace into
    * one `cws` array ordered by code (codes are dense 0..K−1 by
    * construction — seeds are `row_number()-1` and Lloyd preserves the
    * key set), broadcast-joined on `sub` alone (m rows), and the
    * argmin runs inside the codegen'd [[graft.functions.ArgMinL2Sq6]]
    * expression: N·m rows total, ZERO exchanges, one tight fused loop
    * per row. The expression reproduces the old pipeline's arithmetic
    * bit-for-bit — the same sequential (a−b)² fold as `vec_l2sq`,
    * Spark's exact `round(x, 6)` (BigDecimal HALF_UP), first-index
    * tie-break = smallest code, NaN ordered largest — equality with
    * the min_by formulation on the full corpus is pinned by
    * ProductQuantSpec.
    *
    * Parallelism for the per-row argmin work is ensured upstream by
    * [[subvectorsOf]] (repartition only when the input is
    * under-parallel) — the unconditional repartition that used to sit
    * here re-exchanged the subvector frame on every train/encode pass
    * even when the checkpointed assignment already carried the
    * session's layout (guide §2.4). */
  private def nearest(subs: DataFrame, books: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val packed = books.groupBy(col("sub"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(code, cw))), x -> x.cw)")
        .as("cws"))
    val out = (Seq("vec_id", "sub") ++ carry).map(col) :+
      call_function("argmin_l2sq6", col("rs"), col("cws"))
        .cast("long").as("code")
    subs.join(broadcast(packed), "sub")
      .select(out: _*)
  }

  /** Train the m per-subspace codebooks: deterministic residual seed
    * sample (vec_id % cbMod == 0, codes densely renumbered by vec_id)
    * plus `iters` Lloyd steps under L2. Returns (sub, code, cw) as a
    * LOCAL relation.
    * K = |seed sample| must be ≤ 256 for the one-byte-per-subvector
    * claim — the caller picks cbMod accordingly (ProductQuantSpec
    * pins the bound).
    *
    * Round-14 optimization (guide §1.2 "the distributed algorithm" /
    * §5 driver rules): the seed sample is bounded BY CONSTRUCTION to
    * < 256 vectors, yet the previous shape derived it with a
    * `row_number()` window over the full N·m subvector frame (a
    * corpus-wide exchange to number ≤ 256·m rows), and each Lloyd
    * step's books lived as a distributed plan every consumer
    * re-planned. Now the seed residuals are collected (≤ 256 rows, the
    * engine's bounded-collect idiom) and sliced locally — pure
    * indexing, no arithmetic — and the grid-sized Lloyd means (m×K
    * rows, computed by the SAME distributed aggregation with the SAME
    * `round(x/n, 6)` Spark expression) are collected and merged
    * locally, so the returned codebook is a LocalRelation: downstream
    * broadcasts (encode's packed `cws`, the ADC lookup tables, the
    * centroid-side tables) build from local rows with no corpus
    * re-scan and no extra query stages. The corpus-sized Lloyd
    * assignment pass itself stays distributed, unchanged. */
  def train(assigned: DataFrame, centroids: DataFrame, m: Int,
      cbMod: Int, iters: Int = 1): DataFrame = {
    ensure(assigned)
    val spark = assigned.sparkSession
    import spark.implicits._
    // seed residuals: ≤ 256 rows by the structural filter — collected,
    // ordered by vec_id (the window's ORDER BY), codes 0..K−1 dense
    val seedRes = residuals(
        assigned.filter(col("vec_id") % cbMod === 0 &&
          col("vec_id") < cbMod * 256L), centroids)
      .select(col("vec_id"), col("r")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val subDim = seedRes.headOption.map(_._2.length / m).getOrElse(0)
    var books: Seq[(Long, Long, Seq[Double])] = (0 until m).flatMap { sub =>
      seedRes.zipWithIndex.map { case ((_, r), code) =>
        (sub.toLong, code.toLong,
          r.slice(sub * subDim, (sub + 1) * subDim).toSeq)
      }
    }
    def booksDf(rows: Seq[(Long, Long, Seq[Double])]): DataFrame =
      rows.toDF("sub", "code", "cw")
    val subs = subvectorsOf(assigned, centroids, m)
    var i = 0
    while (i < iters) {
      // one Lloyd step: assign every residual subvector, recompute
      // codeword means (vec_sum — K×subDim buffers cross the exchange,
      // never N×subDim exploded rows), empty codewords keep position.
      // `rs` rides THROUGH the argmin projection (carry) — the
      // pre-round-14 join-back of the assignment onto subs re-shuffled
      // both sides on (vec_id, sub) for a 1:1 match (guide §2.4). The
      // means table is grid-sized (m×K) — collected and merged into the
      // local books (identical to the old left-join + coalesce).
      val means = nearest(subs, booksDf(books), carry = Seq("rs"))
        .groupBy(col("sub"), col("code"))
        .agg(call_function("vec_sum", col("rs")).as("vsum"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"),
          expr("transform(vsum, x -> round(x / n, 6))").as("cw1"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2)))
        .toMap
      books = books.map { case (sub, code, cw) =>
        (sub, code, means.getOrElse((sub, code), cw))
      }
      i += 1
    }
    booksDf(books)
  }

  /** Encode the assigned corpus against trained codebooks:
    * (vec_id, centroid_id, codes) — codes[sub] = nearest codeword id,
    * m small ints per vector. THE code table a 100-TB corpus stores. */
  def encode(assigned: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, m: Int): DataFrame = {
    ensure(assigned)
    val subs = subvectorsOf(assigned, centroids, m)
    // centroid_id rides through the argmin (carry) — no join-back onto
    // `assigned` for a column subvectors already had (guide §2.4)
    nearest(subs, codebooks, carry = Seq("centroid_id"))
      .groupBy(col("vec_id"), col("centroid_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("codes"))
  }

  /** Per-query ADC lookup tables: luts[sub][code+1] =
    * floor(dot(q_sub, cw)·10⁶) — an m×K bigint table per query,
    * broadcast-sized by construction. Returns (qid, luts). */
  def lookupTables(queries: DataFrame, codebooks: DataFrame): DataFrame =
    queries.crossJoin(broadcast(codebooks))
      .withColumn("qsub", slice(col("qv"),
        (col("sub") * size(col("cw")) + 1).cast("int"),
        size(col("cw")).cast("int")))
      .withColumn("lutfp",
        floor(VectorOps.dot(col("qsub"), col("cw")) * FP).cast("long"))
      .groupBy(col("qid"), col("sub"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(code, lutfp))), x -> x.lutfp)")
        .as("arr"))
      .groupBy(col("qid"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, arr))), x -> x.arr)")
        .as("luts"))

  /** Query-INDEPENDENT centroid-side ADC tables (index metadata,
    * derivable once per build): per centroid,
    * wtab[sub][code] = 2·floor(dot(cv_sub, cw)·10⁶) + floor(dot(cw, cw)·10⁶)
    * and cn2fp = floor(dot(cv, cv)·10⁶) — together they recover the
    * reconstruction's squared norm ‖x̂‖² = ‖c‖² + 2·c·r̂ + ‖r̂‖² as an
    * exact integer (subspaces are orthogonal coordinate blocks, so the
    * cross terms decompose per sub). Returns (wcid, cn2fp, wtab). */
  def centroidTables(centroids: DataFrame, codebooks: DataFrame): DataFrame = {
    val wt = centroids.crossJoin(broadcast(codebooks))
      .withColumn("csub", slice(col("cv"),
        (col("sub") * size(col("cw")) + 1).cast("int"),
        size(col("cw")).cast("int")))
      .withColumn("wfp",
        (lit(2L) * floor(VectorOps.dot(col("csub"), col("cw")) * FP)
          + floor(VectorOps.dot(col("cw"), col("cw")) * FP)).cast("long"))
      .groupBy(col("cid"), col("sub"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(code, wfp))), x -> x.wfp)")
        .as("arr"))
      .groupBy(col("cid"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(sub, arr))), x -> x.arr)")
        .as("wtab"))
    centroids
      .withColumn("cn2fp",
        floor(VectorOps.dot(col("cv"), col("cv")) * FP).cast("long"))
      .select(col("cid").as("wcid"), col("cn2fp"))
      .join(wt.withColumnRenamed("cid", "wcid"), "wcid")
  }

  /** IVF-PQ ANN search with ADC: probes pick nprobe centroids per
    * query on true centroid vectors (round-6 cosine, the shared
    * convention); candidates in probed buckets are scored as the
    * NORMALIZED asymmetric product
    * (qcfp + Σ_sub luts[sub][code]) / √(cn2fp + Σ_sub wtab[sub][code])
    * ≈ cos(q, x̂) — every table entry is floor-fixed-point, both sums
    * are exact bigints, and the final ratio is two correctly-rounded
    * IEEE ops on those integers (bit-identical in every engine), so
    * the shortlist ranking is deterministic with NO float vector read:
    * 2m lookups per candidate. The k·refine shortlist re-ranks exactly
    * on true embeddings. `corpus` supplies (vec_id, embedding) for the
    * re-rank only. */
  def adcSearch(codes: DataFrame, codebooks: DataFrame, centroids: DataFrame,
      corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      refine: Int): DataFrame = {
    ensure(corpus)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .groupBy(col("qid"))
      .agg(first(col("qv")).as("qv"), topkBy(col("cd"), col("cid"), nprobe).as("pr"))
      .select(col("qid"), col("qv"), explode(col("pr.id")).as("cid"))
    // q·x̂ = q·centroid + Σ_sub q_sub·codeword: the first term is per
    // probed (query, centroid) — computed once here, fixed-point
    val probesFp = probes
      .join(broadcast(centroids.select(col("cid"), col("cv"))), "cid")
      .withColumn("qcfp",
        floor(VectorOps.dot(col("qv"), col("cv")) * FP).cast("long"))
      .select(col("qid"), col("cid"), col("qcfp"))
    val luts = lookupTables(queries, codebooks)
    val wtabs = centroidTables(centroids, codebooks)
    val cand = codes.join(broadcast(probesFp),
        codes("centroid_id") === probesFp("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(luts), "qid")
      .join(broadcast(wtabs), codes("centroid_id") === wtabs("wcid"))
      // integer ADC: aggregate(zip_with) — fixed order, codegen'd, exact
      .withColumn("ipfp", col("qcfp") + expr(
        "aggregate(zip_with(codes, luts, (c, l) -> element_at(l, CAST(c AS INT) + 1)), 0L, (s, x) -> s + x)"))
      .withColumn("n2fp", greatest(col("cn2fp") + expr(
        "aggregate(zip_with(codes, wtab, (c, l) -> element_at(l, CAST(c AS INT) + 1)), 0L, (s, x) -> s + x)"), lit(1L)))
      .withColumn("adc",
        col("ipfp").cast("double") / sqrt(col("n2fp").cast("double")))
    val shortlist = cand.groupBy(col("qid"))
      .agg(topkBy(col("adc"), col("vec_id"), k * refine).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    val exact = corpus.select(col("vec_id"), col("embedding"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(queries.select(col("qid"), col("qv"))), "qid")
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
    exact.groupBy(col("qid"))
      .agg(topkBy(col("cos"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("long").as("rn"))
  }

  // ---- oracle building blocks (shared with the spec's recall query) --

  /** q_sim_ann_pq parameters: m=32 subspaces × 2 dims over the 64-dim
    * embeddings, codebook seeds vec_id % 3 capped below 3·256 (K ≤ 256
    * always — one byte of entropy per subvector; K = 167 at the test
    * corpus), 1 Lloyd step, IVF centroids vec_id % 97, 5 queries,
    * k=10, nprobe=8, refine=3 (the SQ8 query's probe budget —
    * ProductQuantSpec pins recall ≥ SQ8 at these equal settings).
    *
    * Why m=32 here and not the textbook 8–16: the synthetic corpus is
    * ISOTROPIC random unit vectors (measured: within-label and
    * across-label mean cosine both ≈ 0) — the worst case for any
    * subspace quantizer, since every dimension carries independent
    * entropy. Measured recall@10 vs brute force at equal probe budget
    * on this corpus: m=8 → 0.52, m=16 → 0.98, m=32 → 1.00 (K = 167,
    * 1 Lloyd step). Real embedding corpora live on low-dimensional
    * manifolds where m=8–16 holds recall; m is a per-deployment knob,
    * and even m=32 stores 32 B/vector — 2× under SQ8's 64 B and 8×
    * under fp32 — while keeping the ADC scan float-free. */
  val M = 32
  val CbMod = 3

  val defs: Seq[QDef] = Seq(

    // TRUE product quantization: m-subspace codebooks + integer ADC
    // lookup tables + exact re-rank. The full pipeline — IVF assign,
    // residual split, seeded-Lloyd codebook training, encoding,
    // probing, fixed-point ADC, re-rank — is deterministic and
    // DuckDB-recomputable end to end.
    QDef("q_sim_ann_pq",
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
        |subs AS (SELECT vec_id, centroid_id, CAST(s.sub AS BIGINT) AS sub,
        |           r[(s.sub*2+1):(s.sub*2+2)] AS rs
        |         FROM res CROSS JOIN (SELECT unnest(range(32)) AS sub) s),
        |seeds AS (SELECT sub,
        |            CAST(row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS BIGINT) AS code,
        |            rs AS cw
        |          FROM subs WHERE vec_id % 3 = 0 AND vec_id < 768),
        |sx AS (SELECT t.vec_id, t.sub, s.code, unnest(t.rs) AS a, unnest(s.cw) AS b
        |       FROM subs t JOIN seeds s USING (sub)),
        |sd AS (SELECT vec_id, sub, code, round(sum((a - b) * (a - b)), 6) AS d2
        |       FROM sx GROUP BY 1, 2, 3),
        |sasg AS (SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
        |    FROM sd) WHERE rn = 1),
        |mcomp AS (SELECT t.sub, g.code, generate_subscripts(t.rs, 1) AS pos, unnest(t.rs) AS v
        |          FROM sasg g JOIN subs t USING (vec_id, sub)),
        |m AS (SELECT sub, code, pos, round(sum(v) / count(*), 6) AS mean
        |      FROM mcomp GROUP BY 1, 2, 3),
        |upd AS (SELECT sub, code, list(mean ORDER BY pos) AS cw1 FROM m GROUP BY 1, 2),
        |cb AS (SELECT s.sub, s.code, coalesce(u.cw1, s.cw) AS cw
        |       FROM seeds s LEFT JOIN upd u USING (sub, code)),
        |ex AS (SELECT t.vec_id, t.sub, b.code, unnest(t.rs) AS a, unnest(b.cw) AS w
        |       FROM subs t JOIN cb b USING (sub)),
        |ed AS (SELECT vec_id, sub, code, round(sum((a - w) * (a - w)), 6) AS d2
        |       FROM ex GROUP BY 1, 2, 3),
        |pcodes AS (SELECT vec_id, sub, code FROM (
        |    SELECT vec_id, sub, code,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
        |    FROM ed) WHERE rn = 1),
        |px AS (SELECT q.qid, c.cid, unnest(q.qv) AS a, unnest(c.cv) AS b
        |       FROM q CROSS JOIN c),
        |pd AS (SELECT qid, cid, sum(CAST(a AS DOUBLE) * b) AS dot,
        |              sum(CAST(a AS DOUBLE) * a) AS na, sum(CAST(b AS DOUBLE) * b) AS nb
        |       FROM px GROUP BY 1, 2),
        |probes AS (SELECT qid, cid FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(na) * sqrt(nb)), 6) DESC, cid) AS pr
        |    FROM pd) WHERE pr <= 8),
        |qc AS (SELECT p.qid, p.cid, CAST(floor(pd.dot * 1000000) AS BIGINT) AS qcfp
        |       FROM probes p JOIN pd USING (qid, cid)),
        |lx AS (SELECT q.qid, b.sub, b.code,
        |         unnest(q.qv[(b.sub*2+1):(b.sub*2+2)]) AS a, unnest(b.cw) AS w
        |       FROM q CROSS JOIN cb b),
        |lut AS (SELECT qid, sub, code,
        |          CAST(floor(sum(CAST(a AS DOUBLE) * w) * 1000000) AS BIGINT) AS lutfp
        |        FROM lx GROUP BY 1, 2, 3),
        |wx AS (SELECT c.cid, b.sub, b.code,
        |         unnest(c.cv[(b.sub*2+1):(b.sub*2+2)]) AS a, unnest(b.cw) AS w
        |       FROM c CROSS JOIN cb b),
        |wt AS (SELECT cid, sub, code,
        |         CAST(2 * floor(sum(CAST(a AS DOUBLE) * w) * 1000000)
        |            + floor(sum(w * w) * 1000000) AS BIGINT) AS wfp
        |       FROM wx GROUP BY 1, 2, 3),
        |cx2 AS (SELECT cid, unnest(cv) AS v FROM c),
        |cn AS (SELECT cid, CAST(floor(sum(CAST(v AS DOUBLE) * v) * 1000000) AS BIGINT) AS cn2fp
        |       FROM cx2 GROUP BY 1),
        |adc AS (SELECT qc.qid, a.vec_id,
        |          CAST(qc.qcfp + sum(l.lutfp) AS DOUBLE)
        |            / sqrt(CAST(greatest(cn.cn2fp + sum(w.wfp), 1) AS DOUBLE)) AS adc
        |        FROM qc JOIN assigned a ON a.centroid_id = qc.cid
        |        JOIN pcodes k ON k.vec_id = a.vec_id
        |        JOIN lut l ON l.qid = qc.qid AND l.sub = k.sub AND l.code = k.code
        |        JOIN wt w ON w.cid = a.centroid_id AND w.sub = k.sub AND w.code = k.code
        |        JOIN cn ON cn.cid = a.centroid_id
        |        WHERE a.vec_id <> qc.qid
        |        GROUP BY qc.qid, a.vec_id, qc.qcfp, cn.cn2fp),
        |shortlist AS (SELECT qid, vec_id FROM (
        |    SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY adc DESC, vec_id) AS ar
        |    FROM adc) WHERE ar <= 30),
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
      import s.implicits._
      val e = table(s, dir, "embeddings")
      // localCheckpoint the fan-out node (the engine's grid-sized-
      // intermediate idiom): `assigned` (the N-row index relation)
      // feeds train, encode, and the ADC scan — uncheckpointed, each
      // consumer re-evaluates the full assignment subtree. The
      // persisted twin (IvfIndex.buildPq) materializes exactly this
      // to parquet — the checkpoint is the inline query's analog.
      val assigned = SimilarityOps.ivfAssign(e, 97).localCheckpoint()
      // Round-14 optimization (guide §2.4 / §1.2): the centroid table
      // and the 5 eval queries are broadcast-class index metadata —
      // every prior consumer (probes, LUTs, centroid tables, re-rank)
      // re-scanned the embeddings parquet just to re-derive these ≤
      // N/97-row / 5-row frames, each scan its own AQE stage. One
      // bounded collect off the checkpointed assignment (embedding
      // rides it already) turns both into LocalRelations: identical
      // float vectors, zero extra scans. `books` from train() is
      // likewise local now (bounded m×K by construction).
      val meta = assigned
        .filter(col("vec_id") % 97 === 0 || col("vec_id") < 5)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      val centroids = meta.filter(_._1 % 97 == 0).toSeq
        .toDF("cid", "cv")
      val q = meta.filter(_._1 < 5).toSeq.toDF("qid", "qv")
      val books = train(assigned, centroids, M, CbMod)
      adcSearch(encode(assigned, centroids, books, M), books, centroids,
        e, q, k = 10, nprobe = 8, refine = 3)
    }
  )
}
