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
  */
class PrefixedBandIndex(spark: SparkSession, dir: String,
    payloadName: String, requestedPrefixes: Int) {
  import java.nio.file.{Files, Paths}
  private val metaPath = Paths.get(dir, "_PREFIXES")
  val prefixes: Int =
    if (Files.exists(metaPath))
      new String(Files.readAllBytes(metaPath)).trim.toInt
    else requestedPrefixes

  private def readOpt(sub: String): Option[DataFrame] = {
    val p = new java.io.File(s"$dir/$sub")
    if (p.exists()) Some(spark.read.parquet(p.toString)) else None
  }

  def bands: Option[DataFrame] = readOpt("bands")

  /** History bands restricted to the given bucket prefixes —
    * partition-pruned at the file level, never a full index scan. */
  def bandsForPrefixes(bps: Seq[Int]): Option[DataFrame] =
    bands.map(_.filter(col("bp").isin(bps: _*)))

  def payload: Option[DataFrame] = readOpt(payloadName)

  def append(bands: DataFrame, payload: DataFrame): Unit = {
    if (!Files.exists(metaPath)) {
      Files.createDirectories(Paths.get(dir))
      Files.write(metaPath, prefixes.toString.getBytes)
    }
    bands.withColumn("bp", pmod(col("bucket"), lit(prefixes)))
      .write.mode("append").partitionBy("bp").parquet(s"$dir/bands")
    payload.write.mode("append").parquet(s"$dir/$payloadName")
  }
}
