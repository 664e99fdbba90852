package graft.operators

import graft.functions.{TopKBy, VecSum, VectorOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spherical k-means (Lloyd iterations under cosine similarity) over an
  * embedding corpus — the trainer behind a production IVF index: the
  * deterministic `vec_id % modulus` seed sample that
  * [[SimilarityOps.ivfAssign]] uses directly is a fine sketch, but real
  * indexes train the centroids so buckets track the data's density.
  *
  * Scale shape per iteration (and why it holds at 100 TB):
  *  - assignment: corpus ⨯ broadcast(centroids) scored row-by-row, then
  *    the map-side `argmax_by` aggregate — ONE row per vector crosses
  *    the exchange, never the N×k scored cross product;
  *  - update: `vec_sum` (element-wise vector-sum TypedImperativeAggregate)
  *    + count per centroid — one double[dim] buffer per (centroid ×
  *    map partition) on the exchange, NOT N×dim exploded component
  *    rows; means derive per-centroid on the reduce side;
  *  - the k × dim centroid table is collected to the driver between
  *    iterations (bounded by construction — it IS the broadcast side)
  *    and re-shipped, keeping every iteration's lineage flat.
  *
  * Assignment ranks on the 6-digit-rounded cosine with smallest-cid
  * tie-break (the engine's cross-engine-stable ranking convention);
  * centroids are component means of the assigned vectors. Cosine
  * ranking against an unnormalized mean equals ranking against the
  * normalized mean, so this is spherical k-means without materializing
  * the normalization. A centroid that loses every member keeps its
  * previous position (no respawn heuristic — deterministic).
  *
  * q_kmeans_update pins one update step's arithmetic against DuckDB;
  * KMeansSpec covers the iterative properties (inertia monotone
  * non-increasing, fixpoint = brute-force-nearest assignment, planted
  * clusters recovered) and the no-explode plan shape.
  */
object KMeansOps {

  /** (centroids after `iters` Lloyd steps, final assignment).
    * `corpus` must carry (vec_id, embedding); seeds are the
    * deterministic `vec_id % modulus == 0` sample. */
  def lloyd(corpus: DataFrame, modulus: Int, iters: Int): (DataFrame, DataFrame) = {
    val seeds = corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    lloydFrom(corpus, seeds.toSeq, iters)
  }

  /** Lloyd steps from CALLER-SUPPLIED initial centroids — the retrain
    * path: an index whose corpus has drifted re-trains from its
    * CURRENT centroids (warm start) instead of re-seeding, so bucket
    * identities persist across the retrain and the step count needed
    * to track the drift stays small. */
  def lloydFrom(corpus: DataFrame, initial: Seq[(Long, Seq[Double])],
      iters: Int): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    VectorOps.ensure(spark)
    TopKBy.register(spark)
    VecSum.register(spark)

    val vecs = corpus.select(col("vec_id"), col("embedding"))
    var centroids: Array[(Long, Seq[Double])] = initial.toArray

    def centroidDf = {
      val rows = centroids.toSeq
      spark.createDataFrame(rows).toDF("cid", "cv")
    }

    def assign(c: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(c))
        .withColumn("d", round(VectorOps.cosine(col("embedding"), col("cv")), 6))
        .groupBy(col("vec_id"))
        .agg(call_function("argmax_by",
          struct(col("cid"), col("embedding")), col("d"), col("cid")).as("best"))
        .select(col("vec_id"), col("best.embedding").as("embedding"),
          col("best.cid").as("centroid_id"))

    var i = 0
    while (i < iters) {
      val updated = assign(centroidDf)
        .groupBy(col("centroid_id"))
        .agg(call_function("vec_sum", col("embedding")).as("vsum"),
          count(lit(1)).as("n"))
        // means rounded to 6 decimals (the engine's determinism
        // convention, round-4 advice): vec_sum's double adds are
        // partition-order-dependent in the low bits, and an unrounded
        // mean could flip a cosine sitting exactly on the round(_,6)
        // assignment boundary run-to-run
        .select(col("centroid_id"),
          expr("transform(vsum, x -> round(x / n, 6))").as("cv"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toMap
      // empty centroids keep their previous position
      centroids = centroids.map { case (cid, cv) => (cid, updated.getOrElse(cid, cv)) }
      i += 1
    }

    (centroidDf, assign(centroidDf))
  }

  /** Mean within-cluster distance (1 - cosine) of an assignment against
    * a centroid table — the convergence metric KMeansSpec tracks. */
  def inertia(assigned: DataFrame, centroids: DataFrame): Double = {
    VectorOps.ensure(assigned.sparkSession)
    assigned.join(broadcast(centroids),
        assigned("centroid_id") === centroids("cid"))
      .select(avg(lit(1.0) - VectorOps.cosine(col("embedding"), col("cv"))).as("j"))
      .head().getDouble(0)
  }
}
