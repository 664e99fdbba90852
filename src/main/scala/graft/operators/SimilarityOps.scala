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

  val defs: Seq[QDef] = Seq(

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
  )
}
