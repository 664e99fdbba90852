package graft.operators

import graft._
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column:
  * brute-force cosine top-k as the exactness baseline/oracle, IVF
  * (inverted-file) probing as the scale path.
  *
  * Scale design: brute force is O(N) per query but embarrassingly
  * parallel (scan + per-row dot + top-k partial agg — Spark's sort-limit
  * does per-partition top-k before the single-row merge). IVF cuts the
  * scanned fraction to nprobe/ncentroids: centroids are a broadcast-side
  * table, assignment is one narrow scan, and each query only reads its
  * probed buckets — at 100 TB the bucket assignment would be the
  * partitioning key so a probe touches only matching files.
  */
object SimilarityOps {

  /** All-pairs cosine of `queries` × `corpus`, top-k per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    VectorOps.ensure(corpus.sparkSession)
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("qid", "vec_id", "cos", "rn")
  }

  /** IVF index: deterministic centroid sample (vec_id % modulus == 0),
    * every vector assigned to its nearest centroid. Returns
    * (vec_id, embedding, centroid_id). */
  def ivfAssign(corpus: DataFrame, modulus: Int): DataFrame = {
    VectorOps.ensure(corpus.sparkSession)
    val centroids = corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("d").desc, col("cid"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("d", VectorOps.cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("centroid_id"))
  }

  /** ANN search: probe the `nprobe` nearest centroids per query, exact
    * cosine only within those buckets. */
  def ivfSearch(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    VectorOps.ensure(assigned.sparkSession)
    val wq = Window.partitionBy("qid").orderBy(col("cd").desc, col("cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", VectorOps.cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probes, assigned("centroid_id") === probes("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(VectorOps.cosine(col("embedding"), col("qv")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("qid", "vec_id", "cos", "rn")
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

    // IVF-probed ANN (scale path). Approximate by construction →
    // rows-only driver check; SimilaritySpec measures recall against
    // the brute-force baseline.
    QDef.noOracle("q_sim_ann_ivf") { (s, dir) =>
      val e = table(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      ivfSearch(ivfAssign(e, 97), centroids, q, 10, 8)
    },
  )
}
