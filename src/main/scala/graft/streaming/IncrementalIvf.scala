package graft.streaming

import graft.operators.{IvfIndex, SimilarityOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of the persisted IVF ANN index — the
  * continuous-ingestion twin of [[graft.operators.IvfIndex]]: embedding
  * vectors arrive as a stream, each micro-batch is assigned to its
  * nearest EXISTING centroid (broadcast centroid table, the same
  * `ivfAssignTo` arithmetic as the batch build) and lands as files in
  * the batch's own partition directory. A production training-data
  * pipeline embeds documents continuously; rebuilding a 100 TB index
  * per snapshot is the thing this avoids.
  *
  * Layout: `centroids/` plus `assigned/batch=<id>/centroid_id=<cid>/`.
  * Both levels are discovered partition columns, so
  * [[graft.operators.IvfIndex.search]] over the same directory keeps
  * its file-level pruning: a probe lists only the `centroid_id`
  * directories it probes, across every batch.
  *
  * Scale + delivery contract:
  *  - each micro-batch writes ONLY its own files — no rewrite of
  *    existing data, no read of the corpus; per-batch cost is
  *    O(batch × k centroids) assignment plus the write;
  *  - replay-idempotent under foreachBatch's at-least-once: the batch
  *    id keys the output directory and the write is `overwrite`, so a
  *    redelivered batch deterministically replaces its own previous
  *    attempt — never duplicates rows into the index (the same
  *    batch-id-keyed effect the JDBC ledger gives the CDC sink);
  *  - centroids are FIXED between retrains, so assignment is
  *    order-independent and stream==batch: ingesting a corpus in any
  *    micro-batch split yields byte-identical (vec_id, centroid_id)
  *    assignments to one-shot `ivfAssignTo` against the same
  *    centroids. Retraining (drifted corpus) is the offline path —
  *    `IvfIndex.buildTrained` into a fresh directory, then swap;
  *  - many small batches accumulate small files: [[consolidate]] rolls
  *    the whole batch history into a single `batch=0` in a FRESH
  *    directory (same centroids, swap readers when done) — root-level
  *    [[graft.operators.Compaction]] would flatten the partition
  *    directories and cost search its file-level pruning, so the
  *    maintenance pass must rewrite through `partitionBy` instead.
  */
object IncrementalIvf {

  /** Build the fixed centroid set from the bootstrap corpus (the
    * deterministic `vec_id % modulus` sample the batch index uses) and
    * assign the bootstrap under `batch=0`. */
  def bootstrap(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val spark = corpus.sparkSession
    corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    writeBatch(corpus, dir, 0L)
    new IvfIndex(spark, dir)
  }

  /** [[bootstrap]] plus the PQ CODE layout: the bootstrap's int8
    * residual codes land under `pq/batch=0`, and every later
    * micro-batch maintains its own `pq/batch=<id>` alongside its
    * assignment (the presence of `pq/` is the maintenance switch).
    * Codes derive DETERMINISTICALLY from (assignment, centroids), so
    * the stream-maintained code table is byte-identical to
    * `IvfIndex.buildPq` over the same corpus, and `searchPq` works
    * unchanged — batch and centroid_id are both discovered partition
    * levels, exactly like the float layout. */
  def bootstrapPq(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val spark = corpus.sparkSession
    corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // seed pq/ FIRST so writeBatch sees the maintenance switch
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = SimilarityOps.ivfAssignTo(
      corpus.select(col("vec_id"), col("embedding")), centroids).cache()
    try {
      assigned.write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/assigned/batch=0")
      SimilarityOps.pqCodes(assigned, centroids)
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/pq/batch=0")
    } finally assigned.unpersist()
    new IvfIndex(spark, dir)
  }

  /** Assign one micro-batch against the persisted centroids and write
    * it into its own `batch=<id>` directory (overwrite → replay-safe). */
  def processBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    require(batchId > 0, s"batch ids >= 1 (0 is the bootstrap), got $batchId")
    // empty micro-batch = no-op: a zero-row write would still create a
    // footer-less batch=N dir (the IncrementalPostings guard's rationale)
    if (batch.isEmpty) return
    writeBatch(batch, dir, batchId)
  }

  private def writeBatch(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = SimilarityOps.ivfAssignTo(
      batch.select(col("vec_id"), col("embedding")), centroids).cache()
    try {
      assigned.write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/assigned/batch=$batchId")
      // a PQ-maintained index ([[bootstrapPq]]) keeps its code table
      // current per batch — same batch-id-keyed overwrite, so a
      // replayed batch replaces BOTH layouts deterministically
      if (IndexFs.exists(spark, s"$dir/pq"))
        SimilarityOps.pqCodes(assigned, centroids)
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/pq/batch=$batchId")
    } finally assigned.unpersist()
  }

  /** Wire a (vec_id, embedding) stream into the index; stream batch n
    * lands as `batch=n+1` (0 is the bootstrap). */
  def start(vectors: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, dir, id + 1)
      }
      .start()

  /** Small-files maintenance: rewrite the accumulated batch history as
    * one consolidated `batch=0` under `intoDir` (centroids copied
    * unchanged), preserving the partition layout — and therefore
    * search's file pruning — that a flat compaction of the root would
    * destroy. Offline pass: swap readers to `intoDir` when it
    * completes, then resume the stream against it (next batch ids
    * continue from the stream's checkpoint; collisions are impossible
    * because batch=0 is reserved for bootstrap/consolidation). */
  def consolidate(spark: SparkSession, dir: String, intoDir: String): Unit = {
    spark.read.parquet(s"$dir/centroids")
      .write.mode("overwrite").parquet(s"$intoDir/centroids")
    // reading through the index applies the takedown tombstones, so
    // tombstoned vectors leave PHYSICALLY and the fresh dir needs no
    // deletes/ (the IncrementalPostings.consolidate contract)
    val consolidated = new IvfIndex(spark, dir).assigned
      .select(col("vec_id"), col("embedding"),
        col("centroid_id").cast("long").as("centroid_id"))
    consolidated
      .write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$intoDir/assigned/batch=0")
    // codes derive deterministically from (assignment, centroids):
    // RECOMPUTING them over the consolidated float layout is identical
    // to (and simpler than) rolling up the code batch history
    if (IndexFs.exists(spark, s"$dir/pq"))
      SimilarityOps.pqCodes(
          spark.read.parquet(s"$intoDir/assigned/batch=0")
            .select(col("vec_id"), col("embedding"),
              col("centroid_id").cast("long").as("centroid_id")),
          spark.read.parquet(s"$intoDir/centroids"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/pq/batch=0")
  }

  /** Open the maintained index for search (same probe path as the
    * batch-built index — the layout contract is shared). */
  def index(spark: SparkSession, dir: String): IvfIndex =
    new IvfIndex(spark, dir)

  /** Per-batch assignment-quality stats — the DRIFT METRIC: centroids
    * are fixed between retrains, so under distribution drift recall
    * decays SILENTLY (new vectors land in far-away buckets and probes
    * miss them). One row per ingested batch: vector count and mean
    * assign distance (1 − cosine to the assigned centroid, the
    * KMeansOps.inertia measure). Reading it: `batch=0` is the
    * build-time baseline; a later batch whose `drift` sits well above
    * it is the retrain signal. Cost: one broadcast join + hash agg
    * over the index — a maintenance-cadence query, not a per-ingest
    * tax (assignments store no score column; recomputing the cosine
    * here keeps the stored layout byte-identical to the batch build). */
  def driftStats(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorOps.ensure(spark)
    val idx = new IvfIndex(spark, dir)
    // assigned() applies tombstones but prunes the batch column —
    // read the raw layout for per-batch attribution (deletes only
    // lower a batch's n; a tombstoned vector's past drift already
    // served its signal)
    spark.read.parquet(s"$dir/assigned")
      .join(broadcast(idx.centroids),
        col("centroid_id") === col("cid"))
      .groupBy(col("batch").cast("long").as("batch"))
      .agg(count(lit(1)).as("n"),
        avg(lit(1.0) - round(graft.functions.VectorOps.cosine(
          col("embedding"), col("cv")), 6)).as("drift"))
      .orderBy("batch")
  }

  /** RETRAIN + consolidate: one maintenance pass that closes the
    * drift loop. Runs `iters` Lloyd steps (KMeansOps.lloydFrom) over
    * the accumulated tombstone-applied corpus, WARM-STARTED from the
    * index's current centroids, then lands the re-assigned corpus as
    * a consolidated `batch=0` under `intoDir` — same offline-swap
    * contract as [[consolidate]] (readers move to `intoDir` when it
    * completes; the stream resumes against it). Warm start means the
    * centroid set tracks the drifted density in few steps and bucket
    * ids persist; a bootstrap-seeded retrain is `IvfIndex.buildTrained`
    * into a fresh dir (equivalent result, more steps). */
  def retrainConsolidate(spark: SparkSession, dir: String, intoDir: String,
      iters: Int): Unit = {
    val idx = new IvfIndex(spark, dir)
    val current = idx.centroids
      .select(col("cid"), col("cv").cast("array<double>").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val corpus = idx.assigned.select(col("vec_id"), col("embedding"))
    val (centroids, assigned) =
      graft.operators.KMeansOps.lloydFrom(corpus, current, iters)
    centroids.write.mode("overwrite").parquet(s"$intoDir/centroids")
    assigned.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$intoDir/assigned/batch=0")
    // retrained centroids invalidate every residual: recompute the PQ
    // codes against the NEW centroid set (same deterministic derivation)
    if (IndexFs.exists(spark, s"$dir/pq"))
      SimilarityOps.pqCodes(
          spark.read.parquet(s"$intoDir/assigned/batch=0")
            .select(col("vec_id"), col("embedding"),
              col("centroid_id").cast("long").as("centroid_id")),
          spark.read.parquet(s"$intoDir/centroids"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/pq/batch=0")
  }
}
