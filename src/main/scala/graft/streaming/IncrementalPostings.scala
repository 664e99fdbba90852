package graft.streaming

import graft.operators.Bm25
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming maintenance of a persisted INVERTED INDEX — the
  * continuous-ingestion twin of the batch BM25 query (q_bm25), built
  * the way [[IncrementalIvf]] maintains the ANN index: documents
  * arrive as a stream, each micro-batch tokenizes ITS OWN docs into
  * postings (term, doc_id, tf, dl) and lands them in the batch's own
  * partition directory, bucketed by a hash of the term so a search
  * touches only its terms' buckets at the FILE level.
  *
  * Layout: `postings/batch=<id>/term_bucket=<b>/` plus a 1-row
  * `stats/batch=<id>/` (n_docs, sum_dl), a thin `doclens/batch=<id>/`
  * (doc_id, dl), and tombstones in `deletes/del=<id>/`. Both postings
  * levels are discovered partition columns; corpus-wide N and avgdl
  * aggregate the TINY per-batch stats rows minus the tombstone mass,
  * never the postings.
  *
  * Scale + delivery contract (the IncrementalIvf shape):
  *  - per-batch cost is O(batch tokens) tokenize + write — no read or
  *    rewrite of the accumulated index;
  *  - replay-idempotent under foreachBatch's at-least-once: the batch
  *    id keys both output directories and the writes are `overwrite`,
  *    so a redelivered batch replaces its own previous attempt;
  *  - every BM25 ingredient is a sum over per-doc terms (tf, dl) or a
  *    per-term/global count (df, N, sum_dl), all independent of how
  *    docs were split into batches — so search over the maintained
  *    index EQUALS the one-shot batch ranking, by construction (the
  *    scoring itself is the shared [[graft.operators.Bm25]]);
  *  - search reads only `term_bucket ∈ hash(query terms)` leaves
  *    (file-level pruning, like IVF's centroid_id probe), then filters
  *    to the exact terms — the bucket is a 1/NB prefilter, the term
  *    equality the exactness.
  *
  * Assumes each document id arrives in exactly ONE ingest batch (a
  * corpus stream). Takedowns go through [[delete]] (tombstones applied
  * at search, physically removed by [[consolidate]]); re-ingesting a
  * CHANGED doc is delete + ingest-under-a-new-batch, and full
  * mutation-tracking is the CDC materializer's territory.
  */
object IncrementalPostings {

  /** Term-hash fanout: search prunes to |terms| of these NB buckets.
    * Sized like the dedup band fanout: large enough that a few-term
    * query skips ~95% of files, small enough that tiny batches don't
    * scatter into thousands of near-empty leaves. */
  val NB = 64

  private def bucketCol = pmod(xxhash64(col("term")), lit(NB)).cast("int")

  /** Bucket of one query term, computed by LOCALLY evaluating the SAME
    * Catalyst expressions [[bucketCol]] is built from (Pmod∘XxHash64,
    * a literal in place of the column) — never a driver-side
    * reimplementation of xxhash64, and never a distributed job just to
    * hash a handful of query terms before the pruned scan can even
    * start. */
  private def bucketOf(term: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    Pmod(new XxHash64(Seq(Literal(term))), Literal(NB.toLong))
      .eval(null).asInstanceOf[Long].toInt
  }

  /** (doc_id, dl, term, tf, positions) for every term of every doc —
    * positions are the term's sorted 0-based token offsets (the
    * POSITIONAL part of the index: ~one extra int per token, what
    * makes phrase queries a per-doc array intersection instead of a
    * corpus re-scan). */
  private[streaming] def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        posexplode(col("w")).as(Seq("pos", "term")))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))

  /** Tokenize one micro-batch of (doc_id, text) and write its postings
    * + stats + per-doc lengths under the batch's own directories
    * (overwrite → replay-safe). `doclens` (doc_id, dl — two longs per
    * doc) is what later [[delete]]s resolve lengths against without
    * touching the postings tree. */
  def processBatch(docs: DataFrame, dir: String, batchId: Long): Unit = {
    // empty micro-batches are routine under a real trigger cadence; a
    // zero-row write still creates batch=N dirs (just _SUCCESS), which
    // break per-dir reads' schema inference and accumulate forever —
    // and skipping is replay-consistent (redelivered nothing is nothing)
    if (docs.isEmpty) return
    tokenize(docs).withColumn("term_bucket", bucketCol)
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$dir/postings/batch=$batchId")
    // two actions consume dl (doclens write, stats aggregate) — pin it
    // so the batch isn't re-scanned and re-split per action
    val dl = docs.select(col("doc_id"),
      size(split(trim(col("text")), " ")).as("dl")).persist()
    try {
      dl.write.mode("overwrite").parquet(s"$dir/doclens/batch=$batchId")
      dl.agg(count(lit(1)).as("n_docs"),
          sum(col("dl")).cast("long").as("sum_dl"))
        .write.mode("overwrite").parquet(s"$dir/stats/batch=$batchId")
    } finally dl.unpersist(blocking = false)
  }

  /** Take documents DOWN (the compliance path a training corpus needs):
    * tombstones land in `deletes/del=<id>/` (overwrite → replay-safe);
    * [[search]]/[[phraseSearch]] apply them as a broadcast anti join
    * and subtract their mass from N/avgdl, so ranking equals a batch
    * ranking over the reduced corpus EXACTLY; [[consolidate]] later
    * drops the postings physically. Ids that were never ingested are
    * ignored (resolved against `doclens`); deleting the same id in two
    * delete batches charges once (tombstones dedup at read). Cost is
    * O(doclens) to resolve lengths — a thin two-long-per-doc table,
    * never the postings tree. */
  def delete(spark: SparkSession, dir: String, docIds: Seq[Long],
      deleteId: Long): Unit = {
    import spark.implicits._
    // an index that has never ingested a batch has nothing to delete —
    // the takedown is a no-op, not a path-not-found crash
    if (!IndexFs.hasChildDirs(spark, s"$dir/doclens")) return
    spark.read.parquet(s"$dir/doclens")
      .join(broadcast(docIds.toDF("doc_id")), "doc_id")
      .select(col("doc_id"), col("dl")).dropDuplicates("doc_id")
      .write.mode("overwrite").parquet(s"$dir/deletes/del=$deleteId")
  }

  private val tombstoneSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.IntegerType)))

  /** Accumulated tombstones, deduped — empty frame if none exist. */
  private def tombstones(spark: SparkSession, dir: String): DataFrame =
    IndexFs.readOrEmpty(spark, s"$dir/deletes", tombstoneSchema)
      .select(col("doc_id"), col("dl")).dropDuplicates("doc_id")

  /** 1-row (n, avgdl) over the LIVE corpus: per-batch stats sums minus
    * the tombstones' mass — same longs, same division as a batch
    * aggregation over the reduced corpus. */
  private def liveStats(spark: SparkSession, dir: String): DataFrame = {
    val dead = tombstones(spark, dir)
      .agg(count(lit(1)).as("_dn"),
        coalesce(sum(col("dl")), lit(0L)).cast("long").as("_ddl"))
    spark.read.parquet(s"$dir/stats")
      .agg(sum(col("n_docs")).cast("long").as("_n0"),
        sum(col("sum_dl")).cast("long").as("_s0"))
      .crossJoin(dead)
      .select((col("_n0") - col("_dn")).as("n"),
        ((col("_s0") - col("_ddl")).cast("double") /
          (col("_n0") - col("_dn"))).as("avgdl"))
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

  /** Small-files maintenance, the [[IncrementalIvf.consolidate]] move:
    * roll the accumulated batch history into one `batch=0` under a
    * FRESH directory THROUGH `partitionBy(term_bucket)` — a root-level
    * compaction would flatten the bucket directories and cost search
    * its file-level pruning. Stats collapse to one row (the per-batch
    * rows only ever feed a sum). Offline pass: swap readers when done;
    * the resumed stream's batch ids continue past 0. */
  def consolidate(spark: SparkSession, dir: String, intoDir: String): Unit = {
    val dead = tombstones(spark, dir).select("doc_id")
    spark.read.parquet(s"$dir/postings")
      .join(broadcast(dead), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("dl"), col("term"), col("tf"), col("positions"),
        col("term_bucket").cast("int").as("term_bucket"))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$intoDir/postings/batch=0")
    // tombstoned docs leave physically: surviving doclens are rewritten
    // and stats recomputed from them, so the fresh dir needs NO deletes
    val live = spark.read.parquet(s"$dir/doclens")
      .join(broadcast(dead), Seq("doc_id"), "left_anti")
    live.write.mode("overwrite").parquet(s"$intoDir/doclens/batch=0")
    live.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).cast("long").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$intoDir/stats/batch=0")
  }

  /** BM25 top-k over the maintained index — same output schema and
    * same scores as the batch q_bm25 over the union of all ingested
    * batches. The postings scan carries a partition filter on
    * term_bucket (file-level pruning) plus the exact term filter. */
  def search(spark: SparkSession, dir: String, terms: Seq[String], k: Int)
      : DataFrame = {
    val buckets = terms.map(bucketOf)
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket").isin(buckets.distinct: _*) &&
        col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
      .join(broadcast(tombstones(spark, dir).select("doc_id")),
        Seq("doc_id"), "left_anti")
    Bm25.rank(postings, liveStats(spark, dir), k)
  }

  /** Corpus top-k VOCABULARY from the maintained index — the
    * tokenizer-building read (q_vocab_coverage's vocab cut) served
    * from the postings instead of a corpus re-scan: term frequency is
    * Σ tf over live postings (tombstoned docs anti-joined away first,
    * so the vocabulary equals one computed over the reduced corpus),
    * cut to k by (count desc, term) — the same deterministic
    * tie-break. Reads only the (term, tf, doc_id) columns of the
    * postings tree; the cut is one TakeOrdered, never a global sort. */
  def vocabulary(spark: SparkSession, dir: String, k: Int): DataFrame = {
    // zero-batch index → empty vocabulary, not PATH_NOT_FOUND (the
    // same readOrEmpty contract the delete path and the substring
    // index's reports follow)
    val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType)))
    IndexFs.readOrEmpty(spark, s"$dir/postings", postingsSchema)
      .select(col("term"), col("tf"), col("doc_id"))
      .join(broadcast(tombstones(spark, dir).select("doc_id")),
        Seq("doc_id"), "left_anti")
      .groupBy("term").agg(sum(col("tf")).cast("long").as("c"))
      .orderBy(col("c").desc, col("term")).limit(k)
  }

  /** Exact-phrase top-k over the positional index: for phrase
    * w₁ w₂ … wₘ, a doc's occurrence count is |{p : p ∈ pos(w₁),
    * p+1 ∈ pos(w₂), …}| — successive per-doc array intersections of
    * shifted position lists, never a text re-scan. The scan carries
    * the same term_bucket partition filter as [[search]]; the joins
    * after it are keyed on doc_id over only the docs containing EVERY
    * phrase term. Output (doc_id, occurrences, rnk) matches the batch
    * q_phrase_search. */
  def phraseSearch(spark: SparkSession, dir: String, phrase: Seq[String],
      k: Int): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val buckets = phrase.distinct.map(bucketOf)
    val post = spark.read.parquet(s"$dir/postings")
      .filter(col("term_bucket").isin(buckets.distinct: _*) &&
        col("term").isin(phrase.distinct: _*))
      .select(col("doc_id"), col("term"), col("positions"))
      .join(broadcast(tombstones(spark, dir).select("doc_id")),
        Seq("doc_id"), "left_anti")
    // fold left over the phrase: carry the set of valid START positions
    val start = post.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("positions").as("starts"))
    val matched = phrase.zipWithIndex.tail.foldLeft(start) {
      case (acc, (t, i)) =>
        acc.join(
            post.filter(col("term") === t)
              .select(col("doc_id"), col("positions").as("_p")), "doc_id")
          .select(col("doc_id"), expr(
            s"filter(starts, s -> array_contains(_p, s + $i))").as("starts"))
    }
    matched.select(col("doc_id"), size(col("starts")).cast("long").as("occurrences"))
      .filter(col("occurrences") > 0)
      .orderBy(col("occurrences").desc, col("doc_id")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("occurrences").desc, col("doc_id"))).cast("long"))
  }
}
