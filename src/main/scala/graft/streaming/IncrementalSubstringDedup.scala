package graft.streaming

import graft.operators.SubstringDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming exact-substring dedup against a PERSISTENT gram index —
  * the continuous twin of q_dedup_substring: documents arrive as a
  * stream; each micro-batch's sliding K-grams are checked against every
  * gram seen in EARLIER batches (plus the batch's own earlier
  * occurrences), the per-doc duplicate-span report is emitted for the
  * batch's docs, and the batch's NEW grams append to the index.
  *
  * Semantics: ARRIVAL-ORDER keep-first — the retained occurrence of a
  * repeated span is the first one ingested. This equals the batch
  * query's (doc_id, pos)-lexicographic keep-first exactly when batches
  * partition the corpus into ascending doc_id ranges (the spec's
  * contract); under arbitrary arrival order the report is still a
  * valid keep-first dedup, just anchored to arrival rather than id
  * order. A doc id must arrive in exactly ONE batch (corpus ingest);
  * re-ingesting a CHANGED doc is delete+rebuild territory.
  *
  * Layout: `grams/batch=<id>/` rows (g, fe). Both the LOOKUP and the
  * NEWNESS test read only partitions with batch < current (partition-
  * pruned), so a REDELIVERED batch recomputes against exactly the
  * state its first attempt saw and overwrites its own previous output
  * — replay-idempotent without a ledger, like [[IncrementalIvf]].
  *
  * Scale: per-batch cost is one keyed join of the batch's grams
  * against the accumulated index — O(batch + index-probe), with the
  * index growing as the corpus's distinct grams. The parquet index
  * re-shuffles per batch at this layout; a production deployment
  * bucket-sorts the index on g (the CdcSink bucketed-manifest
  * precedent) so batch joins co-locate without re-shuffling the
  * accumulated side. What it NEVER does is recompute history: batch
  * N's report touches batch N's docs only.
  */
object IncrementalSubstringDedup {

  private val indexSchema = StructType(Seq(
    StructField("g", StringType), StructField("fe", LongType)))

  /** Grams of batches strictly before `batchId` (partition-pruned). */
  private def priorIndex(spark: SparkSession, dir: String,
      batchId: Long): DataFrame = {
    val hasPrior = IndexFs.childDirs(spark, s"$dir/grams").exists { n =>
      n.stripPrefix("batch=").toLongOption.exists(_ < batchId)
    }
    if (!hasPrior)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
    else spark.read.parquet(s"$dir/grams")
      .filter(col("batch") < batchId).select("g", "fe")
  }

  /** Process one micro-batch of (doc_id, text): emit the batch's
    * per-doc span report to `reports/batch=<id>` and append its new
    * grams to `grams/batch=<id>` (both overwrite → replay-safe). */
  def processBatch(raw: DataFrame, dir: String, batchId: Long): Unit = {
    // empty micro-batch = no-op: consolidate reads each reports/batch=N
    // dir INDIVIDUALLY, so one footer-less dir from a zero-row write
    // would break it outright (the IncrementalPostings guard's rationale)
    if (raw.isEmpty) return
    val spark = raw.sparkSession
    val docs = SubstringDedup.tokenize(raw)
    // the two writes below are separate Spark actions, and exchange
    // reuse does not span actions — without pinning, the batch would be
    // re-tokenized/exploded and the accumulated prior index re-read and
    // re-joined once PER WRITE (the Scd2History (consumers+1)× lesson)
    val grams = SubstringDedup.gramsEnc(docs).persist()
    // within-batch first occurrence per gram (hash-aggregable long min)
    val localFirst = grams.groupBy("g").agg(min(col("enc")).as("lf"))
    val eff = localFirst.join(priorIndex(spark, dir, batchId), Seq("g"), "left")
      .select(col("g"), coalesce(col("fe"), col("lf")).as("ef"),
        col("fe").isNull.as("isNew"), col("lf"))
      .persist()
    try {
      // an occurrence is a dup iff it is not the EFFECTIVE first — the
      // index's first if the gram was ever seen, else the batch-local one
      val dups = grams.join(eff.select("g", "ef"), "g")
        .filter(col("enc") =!= col("ef"))
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + SubstringDedup.K - 1).as("e"))
      SubstringDedup.spanReport(docs, dups)
        .write.mode("overwrite").parquet(s"$dir/reports/batch=$batchId")
      eff.filter(col("isNew")).select(col("g"), col("lf").as("fe"))
        .write.mode("overwrite").parquet(s"$dir/grams/batch=$batchId")
    } finally {
      eff.unpersist(blocking = false)
      grams.unpersist(blocking = false)
    }
  }

  /** Wire a (doc_id, text) stream into the index. */
  def start(docs: DataFrame, dir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, dir, id)
      }
      .start()

  /** Take documents down: tombstoned ids disappear from [[reports]]
    * (they leave the downstream corpus), but their GRAMS stay in the
    * index deliberately — content removed for compliance should stay
    * blocklisted, so a re-ingested copy of it is charged as fully
    * duplicated rather than slipping back in as "new". That asymmetry
    * (reports forget, the dedup memory doesn't) is the contract; a
    * full forget is a fresh-directory rebuild. */
  def delete(spark: SparkSession, dir: String, docIds: Seq[Long],
      deleteId: Long): Unit = {
    import spark.implicits._
    docIds.distinct.toDF("doc_id")
      .write.mode("overwrite").parquet(s"$dir/deletes/del=$deleteId")
  }

  private def tombstones(spark: SparkSession, dir: String): DataFrame =
    IndexFs.readOrEmpty(spark, s"$dir/deletes",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType))))
      .select("doc_id").distinct()

  private val reportSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_tokens", LongType),
    StructField("n_spans", LongType), StructField("dup_tokens", LongType),
    StructField("dup_ratio", org.apache.spark.sql.types.DoubleType)))

  /** All per-doc reports emitted so far (one row per ingested,
    * non-tombstoned doc); empty frame — not PATH_NOT_FOUND — on an
    * index that has ingested zero batches (the IndexFs.readOrEmpty
    * pattern the delete path already uses). */
  def reports(spark: SparkSession, dir: String): DataFrame =
    IndexFs.readOrEmpty(spark, s"$dir/reports", reportSchema)
      .select("doc_id", "n_tokens", "n_spans", "dup_tokens", "dup_ratio")
      .join(org.apache.spark.sql.functions
        .broadcast(tombstones(spark, dir)), Seq("doc_id"), "left_anti")

  /** Small-files maintenance: roll the gram-index batch history into
    * one `grams/batch=0` under a FRESH directory (reports copied
    * per-batch unchanged — they are the emitted OUTPUT, not state).
    * Offline pass: swap when done; the resumed stream's next batch id
    * must continue past the consolidated history (it does — ids come
    * from the stream's checkpoint), and every later batch sees the
    * whole consolidated index because 0 < any live id. */
  def consolidate(spark: SparkSession, dir: String, intoDir: String): Unit = {
    // grams copied in FULL — tombstoned docs' grams stay as the
    // blocklist (see delete); tombstoned REPORT rows are dropped here
    // so the fresh directory needs no deletes/ at all. readOrEmpty:
    // consolidating a zero-batch index yields an empty batch=0, not a
    // PATH_NOT_FOUND crash.
    IndexFs.readOrEmpty(spark, s"$dir/grams", indexSchema).select("g", "fe")
      .write.mode("overwrite").parquet(s"$intoDir/grams/batch=0")
    val dead = tombstones(spark, dir)
    IndexFs.childDirs(spark, s"$dir/reports")
      .filter(_.startsWith("batch=")).foreach { b =>
        spark.read.parquet(s"$dir/reports/$b")
          .join(org.apache.spark.sql.functions.broadcast(dead),
            Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$intoDir/reports/$b")
      }
  }
}
