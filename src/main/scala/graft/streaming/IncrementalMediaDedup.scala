package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming perceptual near-duplicate detection over MEDIA
  * fingerprints against history — the 64-bit-hash twin of
  * [[IncrementalEmbedDedup]], closing the streaming side of the
  * q_dedup_images / q_dedup_audio batch pair: each micro-batch of
  * (media_id, h) rows — h a perceptual fingerprint such as the image
  * dHash or the audio energy-envelope dHash, decoded upstream in
  * mapPartitions exactly as the batch queries do — is split into
  * `bands` fixed bit-slices, joined against the persisted band index
  * (cross-batch candidates) and itself (in-batch candidates), verified
  * EXACTLY by Hamming distance through an id-keyed join to the
  * fingerprint payload, and appended to the index.
  *
  * Recall contract carried over from the batch queries: with
  * maxHamming < bands, a pair within threshold shares at least one
  * intact band (pigeonhole), so the banded join finds EXACTLY the
  * all-pairs result — streaming loses nothing.
  *
  * 100 TB shape: the index holds `bands` (default 4) small rows per
  * historical media item; fingerprints are 8 bytes, so even the
  * verification payload is metadata-sized next to the media it
  * fingerprints. The bp-prefix layout keeps per-batch history reads
  * sublinear in index size, and takedowns ride
  * [[PrefixedBandIndex.delete]] — a removed item vanishes from
  * candidate generation AND verification (reduced-corpus equality),
  * the compliance contract the text and embedding indexes already pin.
  */
object IncrementalMediaDedup {

  final case class Config(bands: Int = 4, bitsPerBand: Int = 16,
      maxHamming: Int = 3) {
    require(maxHamming < bands,
      s"lossless banding needs maxHamming < bands ($maxHamming >= $bands)")
    require(bands * bitsPerBand == 64,
      s"bands x bitsPerBand must tile the 64-bit fingerprint")
  }

  /** Persistent fingerprint index: band rows + `fingerprints/` payload
    * (media_id, h) — see [[PrefixedBandIndex]] for the bp layout and
    * `_PREFIXES` adopt-on-reopen contract. */
  final class MediaIndex(spark: SparkSession, dir: String,
      requestedPrefixes: Int = 64)
    extends PrefixedBandIndex(spark, dir, "fingerprints", "media_id",
      requestedPrefixes) {
    def fingerprints: Option[DataFrame] = payload
  }

  /** (media_id, band, bucket) rows — bucket is the band's bit-slice of
    * the fingerprint, masked so the top band can't sign-extend. */
  def bandRows(sigs: DataFrame, cfg: Config = Config()): DataFrame = {
    val mask = (1L << cfg.bitsPerBand) - 1
    sigs.select(col("media_id"),
      explode(array((0 until cfg.bands).map(b =>
        struct(lit(b).as("band"),
          expr(s"shiftright(h, ${b * cfg.bitsPerBand}) & $mask")
            .as("bucket"))): _*)).as("bb"))
      .select(col("media_id"), col("bb.band"), col("bb.bucket"))
  }

  /** Process one batch of (media_id, h): returns verified near-dup
    * pairs (m1 < m2, hamming ≤ threshold; in-batch and cross-batch),
    * then indexes the batch. */
  def processBatch(batch: DataFrame, index: MediaIndex,
      cfg: Config = Config()): DataFrame = {
    import batch.sparkSession.implicits._
    val sigs = batch.select(col("media_id"), col("h")).cache()
    // an EMPTY micro-batch must not touch the index: a zero-row append
    // still creates the parquet dir (just _SUCCESS, no footers), and
    // the NEXT batch's history read then fails schema inference —
    // empty batches are routine in any real trigger cadence
    if (sigs.isEmpty) {
      sigs.unpersist()
      return Seq.empty[(Long, Long, Long)].toDF("m1", "m2", "hamming")
    }
    val newBands = bandRows(sigs, cfg).cache()
    // ≤ min(bands·items, prefixes) ints — bounded driver-side
    val bps = newBands
      .select(pmod(col("bucket"), lit(index.prefixes)).cast("int").as("bp"))
      .distinct().as[Int].collect().toSeq
    val histBands = index.bandsForPrefixes(bps).map(_.drop("bp"))
    val searchBands = histBands.map(newBands.unionByName(_)).getOrElse(newBands)
    val cand = newBands.as("a")
      .join(searchBands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(least(col("a.media_id"), col("b.media_id")).as("m1"),
        greatest(col("a.media_id"), col("b.media_id")).as("m2"))
      .distinct()

    val allSigs = index.fingerprints.map(sigs.unionByName(_)).getOrElse(sigs)
    val verified = cand
      .join(allSigs.select(col("media_id").as("m1"), col("h").as("_h1")), "m1")
      .join(allSigs.select(col("media_id").as("m2"), col("h").as("_h2")), "m2")
      .select(col("m1"), col("m2"),
        bit_count(col("_h1").bitwiseXOR(col("_h2")))
          .cast("bigint").as("hamming"))
      .filter(col("hamming") <= cfg.maxHamming)
      .cache()
    verified.count() // materialize before the index advances

    index.append(newBands, sigs)
    sigs.unpersist(); newBands.unpersist()
    verified
  }

  /** Wire a fingerprint stream through per-batch incremental dedup;
    * near-dup pairs append to `dupDir` as parquet. */
  def start(fingerprints: DataFrame, indexDir: String, dupDir: String,
      checkpointDir: String, cfg: Config = Config()): StreamingQuery =
    fingerprints.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val index = new MediaIndex(batch.sparkSession, indexDir)
        val verified = processBatch(batch, index, cfg)
        try verified.write.mode("append").parquet(dupDir)
        finally verified.unpersist()
      }
      .start()
}
