package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only persistent LSH band index shared by the text
  * ([[IncrementalDedup.DedupIndex]]) and embedding
  * ([[IncrementalEmbedDedup.EmbedIndex]]) incremental dedup paths:
  * `bands/` ((id, band, bucket) rows) partitioned by
  * `bp = pmod(bucket, prefixes)` plus one payload table (shingle sets /
  * vectors) used for exact verification of surviving candidates.
  *
  * The bp layout is what keeps history lookups sublinear as the index
  * grows: a micro-batch only opens the band partitions its own buckets
  * hash into, never a full index scan.
  *
  * The prefix count is a property of the layout ON DISK: it is
  * recorded in `_PREFIXES` at first append and ADOPTED when an
  * existing index is reopened — a caller passing a different value
  * would otherwise prune the wrong bp= partitions and silently drop
  * historical duplicate matches.
  *
  * Takedown contract ([[delete]]): a tombstoned id's band rows AND
  * payload vanish from every read — the index behaves as if the doc
  * was never ingested (reduced-corpus equality; the OPPOSITE of the
  * substring index's keep-the-grams blocklist, because here the
  * payload IS the content we were asked to remove). Consequence: a
  * re-ingested copy of tombstoned content is treated as new.
  * [[consolidate]] later drops the rows physically, preserving the
  * bp layout (and therefore the prefix pruning) in the fresh dir.
  */
class PrefixedBandIndex(spark: SparkSession, dir: String,
    payloadName: String, idCol: String, requestedPrefixes: Int) {
  // All probes ride the path's Hadoop FileSystem (IndexFs): a
  // java.nio probe answers false for hdfs://s3a:// URIs, which would
  // make a reopened index IGNORE the on-disk _PREFIXES value and
  // prune the wrong bp= partitions — silently dropping historical
  // duplicate matches.
  private val metaPath = s"$dir/_PREFIXES"
  val prefixes: Int =
    IndexFs.readText(spark, metaPath).map(_.trim.toInt)
      .getOrElse(requestedPrefixes)

  private def readOpt(sub: String): Option[DataFrame] = {
    val p = s"$dir/$sub"
    // a dir holding only write markers (_SUCCESS, checksum siblings)
    // reads as ABSENT: an empty micro-batch's append creates exactly
    // that shape, and handing it to spark.read fails schema inference
    // — the guard both prevents and HEALS the footer-less state
    if (IndexFs.exists(spark, p) && IndexFs.listNames(spark, p)
        .exists(n => !n.startsWith("_") && !n.startsWith(".")))
      Some(spark.read.parquet(p))
    else None
  }

  /** Accumulated tombstoned ids, deduped; None if no delete ever ran.
    * Tombstone count is bounded by takedown volume (compliance events,
    * not corpus size) — broadcast-able by assumption, like the postings
    * index's. */
  private def tombstones: Option[DataFrame] =
    readOpt("deletes").map(_.select(idCol).distinct())

  private def minusTombstones(df: DataFrame): DataFrame =
    tombstones.map(t => df.join(broadcast(t), Seq(idCol), "left_anti"))
      .getOrElse(df)

  def bands: Option[DataFrame] = readOpt("bands").map(minusTombstones)

  /** History bands restricted to the given bucket prefixes —
    * partition-pruned at the file level, never a full index scan. */
  def bandsForPrefixes(bps: Seq[Int]): Option[DataFrame] =
    bands.map(_.filter(col("bp").isin(bps: _*)))

  def payload: Option[DataFrame] = readOpt(payloadName).map(minusTombstones)

  def append(bands: DataFrame, payload: DataFrame): Unit = {
    if (IndexFs.readText(spark, metaPath).isEmpty)
      IndexFs.writeText(spark, metaPath, prefixes.toString)
    // repartition ON bp before the partitioned write: band buckets are
    // hashes, so without it every write task holds rows of ~every
    // prefix and emits one file per (task × bp) — tasks×prefixes small
    // files PER MICRO-BATCH. With it each bp lands in one task → one
    // file per touched prefix per batch, at the cost of shuffling the
    // batch's own (small) band table. (The ParquetTableStore bucket
    // write makes the same move for the same reason.)
    bands.withColumn("bp", pmod(col("bucket"), lit(prefixes)))
      .repartition(col("bp"))
      .write.mode("append").partitionBy("bp").parquet(s"$dir/bands")
    payload.write.mode("append").parquet(s"$dir/$payloadName")
  }

  /** Take ids DOWN: tombstones land in `deletes/del=<id>/` (overwrite →
    * replay-safe); every read then anti-joins them away, so candidate
    * generation and verification behave exactly as if the ids were
    * never ingested. Never-ingested ids tombstone harmlessly (the anti
    * join simply matches nothing). */
  def delete(ids: Seq[Long], deleteId: Long): Unit = {
    // an empty takedown must not touch the index: a zero-row write
    // would leave a footer-less del= dir (the readOpt empty-append
    // hazard), and there is nothing to record anyway
    if (ids.isEmpty) return
    import spark.implicits._
    ids.distinct.toDF(idCol)
      .write.mode("overwrite").parquet(s"$dir/deletes/del=$deleteId")
  }

  /** Small-files maintenance, the [[IncrementalIvf.consolidate]] move:
    * rewrite the accumulated (live) band rows as one pass THROUGH
    * `partitionBy(bp)` into a fresh directory — a root-level compaction
    * would flatten the bp directories and cost every future batch its
    * prefix pruning. Tombstoned ids leave physically (reads already
    * hid them), so the fresh dir needs no `deletes/`; `_PREFIXES`
    * carries over unchanged because bp values are relative to it. */
  def consolidate(intoDir: String): Unit = {
    IndexFs.writeText(spark, s"$intoDir/_PREFIXES", prefixes.toString)
    bands.foreach { b =>
      val cols = b.columns.filter(_ != "bp").map(col) :+ col("bp").cast("int").as("bp")
      b.select(cols: _*)
        // one shuffle keyed on bp → ONE file per prefix — the point of
        // the compaction; without it the rewrite re-scatters every
        // prefix across all tasks and reproduces the small files
        .repartition(col("bp"))
        .write.mode("overwrite").partitionBy("bp").parquet(s"$intoDir/bands")
    }
    payload.foreach(
      _.write.mode("overwrite").parquet(s"$intoDir/$payloadName"))
  }
}
