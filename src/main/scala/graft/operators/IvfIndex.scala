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

  /** The SQ8 code table (vec_id, centroid_id, sc, codes), tombstones
    * hidden like [[assigned]]. Present only on [[IvfIndex.buildSq8]]
    * indexes. */
  def sq8Codes: DataFrame = {
    val raw = spark.read.parquet(s"$dir/sq8")
    tombstones.map(t => raw.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(raw)
  }

  /** The per-subspace PQ codebooks (sub, code, cw) — index METADATA:
    * m×K×subDim doubles, broadcast-sized, frozen at build/bootstrap
    * time (re-derived only by a retrain). Present only on
    * [[IvfIndex.buildPq]] / `IncrementalIvf.bootstrapPq` indexes. */
  def codebooks: DataFrame = spark.read.parquet(s"$dir/codebooks")

  /** The TRUE-PQ code table (vec_id, centroid_id, codes) — m codebook
    * indices per vector (m BYTES of entropy, not dim bytes: the
    * compression class a 100-TB fp32 corpus needs), tombstones hidden
    * like [[assigned]]. */
  def pqCodes: DataFrame = {
    val raw = spark.read.parquet(s"$dir/pq")
    tombstones.map(t => raw.join(broadcast(t), Seq("vec_id"), "left_anti"))
      .getOrElse(raw)
  }

  /** TRUE-PQ ANN top-k with ADC lookup tables: probe selection as
    * [[search]]; the probed partitions are read from the m-byte PQ
    * CODE table and scored as integer fixed-point
    * qcfp + Σ_sub luts[sub][code] (per-query m×K tables riding a
    * broadcast — NO float vector is read for scanning); only the
    * k·refine shortlist opens float partitions for the exact re-rank.
    * Equals `ProductQuant.adcSearch` over the same corpus and
    * codebooks (ProductQuantSpec). */
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
    val probesFp = probes
      .join(broadcast(centroids.select(col("cid"), col("cv"))), "cid")
      .withColumn("qcfp", floor(graft.functions.VectorOps.dot(
        col("qv"), col("cv")) * ProductQuant.FP).cast("long"))
      .select(col("qid"), col("cid"), col("qcfp"))
    val luts = ProductQuant.lookupTables(
      probes.select(col("qid"), col("qv")).distinct(), codebooks)
    val wtabs = ProductQuant.centroidTables(centroids, codebooks)
    // partition filter on the m-byte CODE table — the narrow scan
    val pruned = pqCodes.filter(col("centroid_id").isin(probedCids: _*))
    val cand = pruned
      .join(broadcast(probesFp), col("centroid_id") === probesFp("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(luts), "qid")
      .join(broadcast(wtabs), pruned("centroid_id") === wtabs("wcid"))
      .withColumn("ipfp", col("qcfp") + expr(
        "aggregate(zip_with(codes, luts, (c, l) -> element_at(l, CAST(c AS INT) + 1)), 0L, (s, x) -> s + x)"))
      .withColumn("n2fp", greatest(col("cn2fp") + expr(
        "aggregate(zip_with(codes, wtab, (c, l) -> element_at(l, CAST(c AS INT) + 1)), 0L, (s, x) -> s + x)"), lit(1L)))
      .withColumn("adc",
        col("ipfp").cast("double") / sqrt(col("n2fp").cast("double")))
    val shortlist = cand.groupBy(col("qid"))
      .agg(call_function("topk_by", col("adc"),
        col("vec_id"), lit(k * refine)).as("top"))
      .select(col("qid"), explode(col("top.id")).as("vec_id"))
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

  /** IVF-SQ8 ANN top-k: same probe selection as [[search]], but the
    * probed partitions are read from the SQ8 CODE table (int8 residual
    * codes — ~dim bytes/vector instead of 4·dim, the form a 100-TB
    * vector corpus can actually keep per bucket), scored
    * asymmetrically against the reconstruction, and only the top
    * k·refine shortlist per query touches true float embeddings for
    * the exact re-rank — itself read partition-PRUNED (shortlist
    * members live in probed buckets by construction). Equals
    * `SimilarityOps.ivfSq8Search` over the same corpus (IvfSq8Spec). */
  def searchSq8(queries: DataFrame, k: Int, nprobe: Int,
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
    val prunedCodes = sq8Codes.filter(col("centroid_id").isin(probedCids: _*))
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

  /** [[build]] plus the SQ8 CODE layout: int8 residual codes
    * (`SimilarityOps.sq8Codes`) persisted `partitionBy(centroid_id)`
    * alongside the float layout — probes scan codes, only the
    * re-rank shortlist opens float partitions ([[IvfIndex.searchSq8]]). */
  def buildSq8(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val idx = build(corpus, dir, modulus)
    SimilarityOps.sq8Codes(
      idx.assigned, idx.centroids)
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$dir/sq8")
    idx
  }

  /** [[build]] plus the TRUE-PQ layout: per-subspace codebooks trained
    * on the corpus's residuals (`ProductQuant.train` — seeded Lloyd,
    * frozen thereafter) persisted under `codebooks/`, and the m-byte
    * code table (`ProductQuant.encode`) under `pq/`, partitioned by
    * centroid_id like the float layout so [[searchPq]] prunes files. */
  def buildPq(corpus: DataFrame, dir: String, modulus: Int,
      m: Int = ProductQuant.M, cbMod: Int = ProductQuant.CbMod): IvfIndex = {
    val idx = build(corpus, dir, modulus)
    val books = ProductQuant.train(idx.assigned, idx.centroids, m, cbMod)
    books.write.mode("overwrite").parquet(s"$dir/codebooks")
    ProductQuant.encode(idx.assigned, idx.centroids,
        corpus.sparkSession.read.parquet(s"$dir/codebooks"), m)
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
