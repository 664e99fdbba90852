package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the "build once, probe
  * many" form of [[SimilarityOps.ivfAssign]]/[[SimilarityOps.ivfSearch]]:
  * `centroids/` plus the assigned corpus laid out
  * `partitionBy(centroid_id)`, so a probe reads ONLY the files of the
  * buckets it probes (partition pruning at the file level — the same
  * claim the inline query can only make about rows). At 100 TB the
  * assignment pass runs once per corpus snapshot and every query
  * afterwards touches nprobe/ncentroids of the data.
  */
final class IvfIndex(spark: SparkSession, dir: String) {

  def centroids: DataFrame = spark.read.parquet(s"$dir/centroids")

  /** Accumulated takedown tombstones ([[IvfIndex.delete]]), deduped;
    * None if no delete ever ran. Probed through the path's Hadoop
    * FileSystem — a `java.io` probe answers false on hdfs://s3a:// and
    * would silently resurrect tombstoned vectors. */
  private def tombstones: Option[DataFrame] =
    if (graft.streaming.IndexFs.exists(spark, s"$dir/deletes"))
      Some(spark.read.parquet(s"$dir/deletes").select("vec_id").distinct())
    else None

  /** The assigned corpus (live rows only — tombstones anti-joined
    * away, so [[search]] equals a search over the reduced corpus);
    * `centroid_id` is the partition column and the anti join runs
    * AFTER partition pruning. */
  def assigned: DataFrame = {
    val raw = spark.read.parquet(s"$dir/assigned")
    tombstones.map(t => raw.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(raw)
  }

  /** Take vectors DOWN (compliance): tombstones land in
    * `deletes/del=<id>/` (overwrite → replay-safe) and every read hides
    * them; [[IncrementalIvf.consolidate]] later drops the rows
    * physically. Never-ingested ids tombstone harmlessly. */
  def delete(vecIds: Seq[Long], deleteId: Long): Unit = {
    import spark.implicits._
    vecIds.distinct.toDF("vec_id")
      .write.mode("overwrite").parquet(s"$dir/deletes/del=$deleteId")
  }

  /** The PQ code table (vec_id, centroid_id, sc, codes), tombstones
    * hidden like [[assigned]]. Present only on [[IvfIndex.buildPq]]
    * indexes. */
  def pqCodes: DataFrame = {
    val raw = spark.read.parquet(s"$dir/pq")
    tombstones.map(t => raw.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(raw)
  }

  /** IVF-PQ ANN top-k: same probe selection as [[search]], but the
    * probed partitions are read from the PQ CODE table (int8 residual
    * codes — ~dim bytes/vector instead of 4·dim, the form a 100-TB
    * vector corpus can actually keep per bucket), scored
    * asymmetrically against the reconstruction, and only the top
    * k·refine shortlist per query touches true float embeddings for
    * the exact re-rank — itself read partition-PRUNED (shortlist
    * members live in probed buckets by construction). Equals
    * `SimilarityOps.ivfPqSearch` over the same corpus (IvfPqSpec). */
  def searchPq(queries: DataFrame, k: Int, nprobe: Int,
      refine: Int): DataFrame = {
    graft.functions.VectorOps.ensure(spark)
    graft.functions.TopKBy.register(spark)
    val probePlan = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", round(
        graft.functions.VectorOps.cosine(col("qv"), col("cv")), 6))
      .groupBy(col("qid"))
      .agg(first(col("qv")).as("qv"),
        call_function("topk_by", col("cd"), col("cid"), lit(nprobe)).as("pr"))
      .select(col("qid"), col("qv"), explode(col("pr.id")).as("cid"))
    val probeRows = probePlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    val probedCids = probeRows.map(_.getLong(2)).distinct.toSeq
    // partition filter on the CODE table — the narrow scan
    val prunedCodes = pqCodes.filter(col("centroid_id").isin(probedCids: _*))
    val recon = prunedCodes.join(broadcast(
        centroids.select(col("cid").as("rcid"), col("cv"))),
        col("centroid_id") === col("rcid"))
      .withColumn("xhat", expr(
        """zip_with(cv, codes, (c, qc) -> CAST(c AS DOUBLE) +
          | (CASE WHEN sc = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
          |  ELSE qc / sc END))""".stripMargin))
      .select(col("vec_id"), col("centroid_id"), col("xhat"))
    val appx = recon.join(broadcast(probes),
        recon("centroid_id") === probes("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ap", round(
        graft.functions.VectorOps.cosine(col("xhat"), col("qv")), 6))
    val shortlist = appx.groupBy(col("qid"))
      .agg(call_function("topk_by", col("ap"), col("vec_id"),
        lit(k * refine)).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
    // exact re-rank: true embeddings, read pruned to the probed
    // partitions, restricted to the broadcast shortlist
    val exact = assigned.filter(col("centroid_id").isin(probedCids: _*))
      .select(col("vec_id"), col("embedding"))
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(spark.createDataFrame(
        java.util.Arrays.asList(probeRows: _*), probePlan.schema)
        .select(col("qid"), col("qv")).distinct()), "qid")
      .withColumn("cos", round(
        graft.functions.VectorOps.cosine(col("embedding"), col("qv")), 6))
    exact.groupBy(col("qid"))
      .agg(call_function("topk_by", col("cos"), col("vec_id"), lit(k)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("long").as("rn"))
  }

  /** ANN top-k for `queries` (qid, qv): probe selection against the
    * broadcast centroid table, then exact cosine over ONLY the probed
    * partitions. The probed bucket-id set is ≤ queries × nprobe —
    * bounded driver-side by construction (same pattern as the dedup
    * indexes' bucket-prefix pruning). */
  def search(queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    graft.functions.VectorOps.ensure(spark)
    graft.functions.TopKBy.register(spark)
    // The probe table is ≤ queries × nprobe rows by construction, so it
    // is materialized ONCE driver-side and rebuilt as a local relation:
    // both downstream consumers (the distinct-cid partition filter here
    // and the broadcast join below) then read the local copy instead of
    // re-running the centroid crossJoin + topk_by subplan — no cache
    // whose unpersist would have to outlive this method's laziness.
    val probePlan = queries.crossJoin(broadcast(centroids))
      .withColumn("cd", round(
        graft.functions.VectorOps.cosine(col("qv"), col("cv")), 6))
      .groupBy(col("qid"))
      .agg(first(col("qv")).as("qv"),
        call_function("topk_by", col("cd"), col("cid"), lit(nprobe)).as("pr"))
      .select(col("qid"), col("qv"), explode(col("pr.id")).as("cid"))
    val probeRows = probePlan.collect()
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    val probedCids = probeRows.map(_.getLong(2)).distinct.toSeq
    // partition filter → only the probed centroid_id= directories are
    // listed and scanned
    val pruned = assigned.filter(col("centroid_id").isin(probedCids: _*))
    val scored = pruned
      .join(broadcast(probes), pruned("centroid_id") === probes("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(
        graft.functions.VectorOps.cosine(col("embedding"), col("qv")), 6))
    scored.groupBy(col("qid"))
      .agg(call_function("topk_by", col("cos"), col("vec_id"), lit(k)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("vec_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("long").as("rn"))
  }
}

object IvfIndex {
  /** Build (or rebuild) the index from (vec_id, embedding): assign
    * every vector to its nearest deterministic-sample centroid and
    * persist the corpus bucketed by that assignment. */
  def build(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val spark = corpus.sparkSession
    SimilarityOps.ivfAssign(corpus, modulus)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/assigned")
    corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    new IvfIndex(spark, dir)
  }

  /** [[build]] plus the PQ CODE layout: int8 residual codes
    * (`SimilarityOps.pqCodes`) persisted `partitionBy(centroid_id)`
    * alongside the float layout — probes scan codes, only the
    * re-rank shortlist opens float partitions ([[IvfIndex.searchPq]]). */
  def buildPq(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val idx = build(corpus, dir, modulus)
    SimilarityOps.pqCodes(
      idx.assigned, idx.centroids)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/pq")
    idx
  }

  /** [[build]] with k-means-trained centroids instead of the raw
    * deterministic sample: `iters` Lloyd steps (KMeansOps) move the
    * seeds to the data's density before the corpus is assigned and
    * bucketed — fuller buckets where vectors crowd, which is what keeps
    * probe recall flat as a real corpus drifts from uniform. Same
    * layout, same search path. */
  def buildTrained(corpus: DataFrame, dir: String, modulus: Int,
      iters: Int): IvfIndex = {
    val spark = corpus.sparkSession
    val (centroids, assigned) = KMeansOps.lloyd(corpus, modulus, iters)
    assigned
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/assigned")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    new IvfIndex(spark, dir)
  }
}
