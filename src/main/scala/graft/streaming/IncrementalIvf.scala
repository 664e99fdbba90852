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

  /** [[bootstrap]] plus the SQ8 CODE layout: the bootstrap's int8
    * residual codes land under `sq8/batch=0`, and every later
    * micro-batch maintains its own `sq8/batch=<id>` alongside its
    * assignment (the presence of `sq8/` is the maintenance switch).
    * Codes derive DETERMINISTICALLY from (assignment, centroids), so
    * the stream-maintained code table is byte-identical to
    * `IvfIndex.buildSq8` over the same corpus, and `searchSq8` works
    * unchanged — batch and centroid_id are both discovered partition
    * levels, exactly like the float layout. */
  def bootstrapSq8(corpus: DataFrame, dir: String, modulus: Int): IvfIndex = {
    val spark = corpus.sparkSession
    corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // seed sq8/ FIRST so writeBatch sees the maintenance switch
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = SimilarityOps.ivfAssignTo(
      corpus.select(col("vec_id"), col("embedding")), centroids).cache()
    try {
      assigned.write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/assigned/batch=0")
      SimilarityOps.sq8Codes(assigned, centroids)
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/sq8/batch=0")
    } finally assigned.unpersist()
    new IvfIndex(spark, dir)
  }

  /** [[bootstrap]] plus the TRUE-PQ layout: per-subspace codebooks are
    * trained ONCE on the bootstrap corpus's residuals
    * (`ProductQuant.train`) and FROZEN — every later micro-batch
    * encodes against them (the faiss contract: codebooks are index
    * metadata, retrained only by the offline retrain path), so the
    * stream-maintained m-byte code table is byte-identical to a
    * one-shot `ProductQuant.encode` of the same corpus against the
    * same books, in any micro-batch split. Layout: `codebooks/` plus
    * `pq/batch=<id>/centroid_id=<cid>/` (presence of `codebooks/` is
    * the maintenance switch). */
  def bootstrapPq(corpus: DataFrame, dir: String, modulus: Int,
      m: Int = graft.operators.ProductQuant.M,
      cbMod: Int = graft.operators.ProductQuant.CbMod): IvfIndex = {
    val spark = corpus.sparkSession
    corpus.filter(col("vec_id") % modulus === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val centroids = spark.read.parquet(s"$dir/centroids")
    val assigned = SimilarityOps.ivfAssignTo(
      corpus.select(col("vec_id"), col("embedding")), centroids).cache()
    try {
      assigned.write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$dir/assigned/batch=0")
      graft.operators.ProductQuant.train(assigned, centroids, m, cbMod)
        .write.mode("overwrite").parquet(s"$dir/codebooks")
      graft.operators.ProductQuant.encode(assigned, centroids,
          spark.read.parquet(s"$dir/codebooks"), m)
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
      // an SQ8-maintained index ([[bootstrapSq8]]) keeps its code table
      // current per batch — same batch-id-keyed overwrite, so a
      // replayed batch replaces BOTH layouts deterministically
      if (IndexFs.exists(spark, s"$dir/sq8"))
        SimilarityOps.sq8Codes(assigned, centroids)
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/sq8/batch=$batchId")
      // a TRUE-PQ index ([[bootstrapPq]]) encodes the batch against the
      // FROZEN bootstrap codebooks — m is recovered from the stored
      // books (max sub + 1; a bounded metadata read)
      if (IndexFs.exists(spark, s"$dir/codebooks")) {
        val books = spark.read.parquet(s"$dir/codebooks")
        val m = books.agg(max(col("sub"))).head().getLong(0).toInt + 1
        graft.operators.ProductQuant.encode(assigned, centroids, books, m)
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/pq/batch=$batchId")
      }
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
    if (IndexFs.exists(spark, s"$dir/sq8"))
      SimilarityOps.sq8Codes(
          spark.read.parquet(s"$intoDir/assigned/batch=0")
            .select(col("vec_id"), col("embedding"),
              col("centroid_id").cast("long").as("centroid_id")),
          spark.read.parquet(s"$intoDir/centroids"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/sq8/batch=0")
    // TRUE-PQ: codebooks are FROZEN metadata — copied verbatim; codes
    // recomputed from the consolidated float layout against them
    if (IndexFs.exists(spark, s"$dir/codebooks")) {
      spark.read.parquet(s"$dir/codebooks")
        .write.mode("overwrite").parquet(s"$intoDir/codebooks")
      val books = spark.read.parquet(s"$intoDir/codebooks")
      val m = books.agg(max(col("sub"))).head().getLong(0).toInt + 1
      graft.operators.ProductQuant.encode(
          spark.read.parquet(s"$intoDir/assigned/batch=0")
            .select(col("vec_id"), col("embedding"),
              col("centroid_id").cast("long").as("centroid_id")),
          spark.read.parquet(s"$intoDir/centroids"), books, m)
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/pq/batch=0")
    }
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
    // retrained centroids invalidate every residual: recompute the SQ8
    // codes against the NEW centroid set (same deterministic derivation)
    if (IndexFs.exists(spark, s"$dir/sq8"))
      SimilarityOps.sq8Codes(
          spark.read.parquet(s"$intoDir/assigned/batch=0")
            .select(col("vec_id"), col("embedding"),
              col("centroid_id").cast("long").as("centroid_id")),
          spark.read.parquet(s"$intoDir/centroids"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/sq8/batch=0")
    // TRUE-PQ: retrained centroids invalidate every residual, so the
    // codebooks RETRAIN too (same deterministic seeded Lloyd, same
    // subspace split recovered from the stored books) and the corpus
    // re-encodes against the new books
    if (IndexFs.exists(spark, s"$dir/codebooks")) {
      val oldBooks = spark.read.parquet(s"$dir/codebooks")
      val m = oldBooks.agg(max(col("sub"))).head().getLong(0).toInt + 1
      val reassigned = spark.read.parquet(s"$intoDir/assigned/batch=0")
        .select(col("vec_id"), col("embedding"),
          col("centroid_id").cast("long").as("centroid_id"))
      val newCents = spark.read.parquet(s"$intoDir/centroids")
      graft.operators.ProductQuant.train(reassigned, newCents, m,
          graft.operators.ProductQuant.CbMod)
        .write.mode("overwrite").parquet(s"$intoDir/codebooks")
      graft.operators.ProductQuant.encode(reassigned, newCents,
          spark.read.parquet(s"$intoDir/codebooks"), m)
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$intoDir/pq/batch=0")
    }
  }
}
