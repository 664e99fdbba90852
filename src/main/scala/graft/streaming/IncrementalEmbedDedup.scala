package graft.streaming

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming embedding near-duplicate detection against history — the
  * vector twin of [[IncrementalDedup]]: each micro-batch of
  * (vec_id, embedding) rows is SRP-banded (`srp_buckets`), joined
  * against the persisted band index (cross-batch candidates) and
  * itself (in-batch candidates), candidates are exactly verified by
  * cosine, duplicate pairs append to `dupDir`, and the batch's bands +
  * vectors are appended to the index.
  *
  * Same 100 TB shape as the text version: the index holds `bands`
  * (default 16) three-int rows per historical vector for candidate
  * generation — history vectors themselves are touched only for the
  * candidates that survive banding, via an id-keyed join. The band
  * index is laid out by bucket prefix (`bp`), so a micro-batch opens
  * only the partitions its own buckets hash into, keeping per-batch
  * history reads sublinear in index size.
  */
object IncrementalEmbedDedup {

  final case class Config(bands: Int = 16, bitsPerBand: Int = 8,
      threshold: Double = 0.9)

  /** Persistent SRP index: band rows + `vectors/` payload (vec_id,
    * embedding, nsq) — see [[PrefixedBandIndex]] for the bp-prefix
    * layout and `_PREFIXES` adopt-on-reopen contract. */
  final class EmbedIndex(spark: SparkSession, dir: String,
      requestedPrefixes: Int = 64)
    extends PrefixedBandIndex(spark, dir, "vectors", "vec_id",
      requestedPrefixes) {
    def vectors: Option[DataFrame] = payload
  }

  /** Process one batch of (vec_id, embedding): returns verified
    * duplicate pairs (v1 < v2, in-batch and cross-batch), then indexes
    * the batch. */
  def processBatch(batch: DataFrame, index: EmbedIndex,
      cfg: Config = Config()): DataFrame = {
    val vecs = DedupOps.withNormSq(
      batch.select(col("vec_id"), col("embedding"))).cache()
    val newBands = DedupOps.srpBands(vecs, cfg.bands, cfg.bitsPerBand).cache()

    // the batch's bucket-prefix set is ≤ min(bands·vecs, prefixes)
    // ints — bounded driver-side by construction; history reads prune
    // to it
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
          && col("a.vec_id") =!= col("b.vec_id"))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("v1"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("v2"))
      .distinct()

    val allVecs = index.vectors.map(vecs.unionByName(_)).getOrElse(vecs)
    // Cached because it must be materialized BEFORE index.append makes
    // the batch's own vectors visible as history; the CALLER owns the
    // unpersist once it has consumed the result (see start) — a
    // long-running stream would otherwise accumulate one pinned
    // DataFrame per micro-batch in executor storage.
    val verified = DedupOps.cosineVerify(cand, allVecs, cfg.threshold).cache()
    verified.count() // materialize before the index advances

    index.append(newBands, vecs)
    vecs.unpersist(); newBands.unpersist()
    verified
  }

  /** Wire an embedding stream through per-batch incremental dedup;
    * duplicate pairs append to `dupDir` as parquet. */
  def start(vectors: DataFrame, indexDir: String, dupDir: String,
      checkpointDir: String, cfg: Config = Config()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val index = new EmbedIndex(batch.sparkSession, indexDir)
        val verified = processBatch(batch, index, cfg)
        try verified.write.mode("append").parquet(dupDir)
        finally verified.unpersist() // per-batch cache must not outlive the batch
      }
      .start()
}
