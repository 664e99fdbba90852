package graft.streaming

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-duplicate detection against history: each micro-batch
  * of documents is MinHash-banded, joined against the persisted band
  * index (cross-batch candidates) and itself (in-batch candidates),
  * candidates are exactly verified by shingle-set Jaccard, duplicate
  * pairs are appended to `dupDir`, and the batch's bands + shingle sets
  * are appended to the index.
  *
  * This is the shape of continuous corpus dedup at 100 TB: the index
  * holds ~16 8-byte bucket rows per historical document (not the
  * documents), candidate generation is an equi-join keyed on bucket
  * hashes, and exact verification touches only candidates. Appends are
  * partition-parallel parquet writes.
  */
object IncrementalDedup {

  final case class Config(numHashes: Int = 32, rowsPerBand: Int = 2,
      threshold: Double = 0.8)

  /** Persistent MinHash-LSH index: band rows + `shingles/` payload
    * (doc_id, shingles, nsh) — see [[PrefixedBandIndex]] for the
    * bp-prefix layout and `_PREFIXES` adopt-on-reopen contract. */
  final class DedupIndex(spark: SparkSession, dir: String,
      requestedPrefixes: Int = 256)
    extends PrefixedBandIndex(spark, dir, "shingles", "doc_id",
      requestedPrefixes) {
    def shingles: Option[DataFrame] = payload
  }

  /** Process one batch of (doc_id, text): returns verified duplicate
    * pairs (d1 < d2, in-batch and cross-batch), then indexes the batch.
    */
  def processBatch(batch: DataFrame, index: DedupIndex,
      cfg: Config = Config()): DataFrame = {
    val sh = DedupOps.shingleArrays(batch).cache()
    val sig = DedupOps.minhashSignatures(sh, cfg.numHashes)
    val newBands = DedupOps.bandTable(sig, cfg.numHashes, cfg.rowsPerBand).cache()

    // the batch's bucket-prefix set is ≤ min(16·docs, prefixes) ints —
    // bounded driver-side by construction; history is read pruned to it
    import batch.sparkSession.implicits._
    val bps = newBands
      .select(pmod(col("bucket"), lit(index.prefixes)).cast("int").as("bp"))
      .distinct().as[Int].collect().toSeq
    val histBands = index.bandsForPrefixes(bps).map(_.drop("bp"))
    val searchBands = histBands.map(newBands.unionByName(_)).getOrElse(newBands)
    // candidates: at least one side is new (new×new or new×hist)
    val cand = newBands.as("a")
      .join(searchBands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .distinct()

    val allShingles = index.shingles.map(sh.unionByName(_)).getOrElse(sh)
    val verified = cand
      .join(allShingles.select(col("doc_id").as("d1"), col("shingles").as("s1"),
        col("nsh").as("n1")), "d1")
      .join(allShingles.select(col("doc_id").as("d2"), col("shingles").as("s2"),
        col("nsh").as("n2")), "d2")
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 6))
      .filter(col("jaccard") >= cfg.threshold)
      .select("d1", "d2", "jaccard")
      .cache()
    verified.count() // materialize before the index advances

    index.append(newBands, sh)
    sh.unpersist(); newBands.unpersist()
    verified
  }

  /** Wire a document stream through per-batch incremental dedup;
    * duplicate pairs append to `dupDir` as parquet. */
  def start(docs: DataFrame, indexDir: String, dupDir: String,
      checkpointDir: String, cfg: Config = Config()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val index = new DedupIndex(batch.sparkSession, indexDir)
        val verified = processBatch(batch, index, cfg)
        try verified.write.mode("append").parquet(dupDir)
        finally verified.unpersist() // per-batch cache must not outlive the batch
      }
      .start()
}
