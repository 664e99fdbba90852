package graft.tools

import graft.streaming.IncrementalDedup.DedupIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the band index's `bp` (bucket-prefix) partitioning
  * buys for history lookups — the [[graft.streaming.PrefixedBandIndex]]
  * analogue of PostingsStress: a synthetic 1M-doc index (16 band rows
  * per doc, the MinHash 32/2 configuration's shape) is written through
  * the REAL `append` path in 4 batches, then a small TRICKLE
  * micro-batch (default 4 docs — half copies of historical docs, so
  * candidates exist; a batch of ≥16 docs would touch every prefix,
  * see the sizing note below) runs the cross-batch candidate join
  * twice —
  *
  *  - PRUNED: history restricted to the batch's own bucket prefixes
  *    (`bandsForPrefixes` — the shipped `processBatch` read), which
  *    opens only the bp= partitions the batch hashes into;
  *  - FULL SCAN: the identical join against the unfiltered band table.
  *
  * Band rows are SYNTHESIZED (bucket = xxhash64(doc, band); copies
  * share their source's buckets) rather than minhashed from text: the
  * artifact under test is the on-disk partition layout and the
  * pruned read, which depend only on the (id, band, bucket) rows the
  * append writes — hashing 1M real texts would measure MinHash
  * throughput, not the index. Identical candidate sets are asserted;
  * the ratio is the point: at corpus scale the band index is the
  * corpus-sized artifact, and a micro-batch that scans all of it is a
  * batch job, not an increment.
  */
object BandIndexStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bandindex-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BAND_DOCS", "1000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val nBands = 16
    val dir = java.nio.file.Files.createTempDirectory("band-stress").toString
    val index = new DedupIndex(spark, dir)

    def bandsOf(ids: org.apache.spark.sql.DataFrame) = ids
      .select(col("doc_id"), col("src"),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("band"))
      // content identity IS the bucket set: copies derive buckets from
      // their SOURCE id so they collide with it in every band
      .withColumn("bucket", xxhash64(col("src"), col("band")))
      .select("doc_id", "band", "bucket")

    val batches = 4
    (0 until batches).foreach { b =>
      val ids = spark.range(b * nDocs / batches, (b + 1) * nDocs / batches)
        .select(col("id").as("doc_id"), col("id").as("src"))
      index.append(bandsOf(ids), ids.select("doc_id"))
    }

    // micro-batch: half fresh docs, half copies of scattered history.
    // SMALL by design: a batch of n docs probes ≤ 16n of the 256
    // prefixes, so the pruning this stress measures is the TRICKLE
    // regime (continuous low-latency ingestion) — a batch of ≥16 docs
    // already touches every prefix and reads the whole index, which is
    // the documented reason `prefixes` must scale with expected batch
    // size on a real deployment (requestedPrefixes at first append).
    val nBatch = sys.env.getOrElse("SPARK_GRAFT_BAND_BATCH", "4").toLong
    val fresh = spark.range(nDocs, nDocs + nBatch / 2)
      .select(col("id").as("doc_id"), col("id").as("src"))
    val copies = spark.range(nDocs + nBatch / 2, nDocs + nBatch)
      .select(col("id").as("doc_id"),
        pmod(xxhash64(col("id")), lit(nDocs)).as("src"))
    val newBands = bandsOf(fresh.unionByName(copies)).cache()
    newBands.count()

    val bps = newBands
      .select(pmod(col("bucket"), lit(index.prefixes)).cast("int").as("bp"))
      .distinct().as[Int].collect().toSeq

    def candidates(hist: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
      newBands.as("a")
        .join(hist.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
        .distinct().as[(Long, Long)].collect().sorted

    def time(run: => Array[(Long, Long)]): (Array[(Long, Long)], Double) = {
      val samples = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val rows = run
        (rows, (System.nanoTime() - t0) / 1e9)
      }
      (samples.head._1, samples.map(_._2).min)
    }

    val (prunedPairs, prunedSec) =
      time(candidates(index.bandsForPrefixes(bps).get.drop("bp")))
    val (fullPairs, fullSec) =
      time(candidates(index.bands.get.drop("bp")))
    assert(prunedPairs.sameElements(fullPairs),
      s"pruned and full-scan candidate sets disagree: " +
        s"${prunedPairs.length} vs ${fullPairs.length}")
    assert(prunedPairs.length >= nBatch / 2,
      s"planted copies should surface as candidates, got ${prunedPairs.length}")

    println(f"""{"metric":"band_index_stress","docs":$nDocs,""" +
      f""""prefixes_total":${index.prefixes},"prefixes_probed":${bps.length},""" +
      f""""candidates":${prunedPairs.length},""" +
      f""""pruned_sec":$prunedSec%.3f,"full_scan_sec":$fullSec%.3f,""" +
      f""""speedup":${fullSec / prunedSec}%.2f}""")
    // the synthetic index is ~D·16 band rows on disk — drop it, or
    // repeated runs accumulate store-sized temp dirs
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
    spark.stop()
  }
}
