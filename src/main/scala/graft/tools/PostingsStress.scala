package graft.tools

import graft.operators.Bm25
import graft.streaming.IncrementalPostings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the inverted index's `term_bucket` partitioning buys
  * at search time: a synthetic corpus (default 1M docs × 25 tokens,
  * 10k-term vocabulary) is ingested through the real
  * [[IncrementalPostings.processBatch]] path in 4 batches, then the
  * same 3-term BM25 search runs twice —
  *
  *  - PRUNED: the shipped search (partition filter on term_bucket,
  *    then the exact term filter) — reads ~|terms|/64 of the files;
  *  - FULL SCAN: identical query without the bucket filter — the term
  *    filter still applies, but only AFTER every postings file is read.
  *
  * Identical results asserted; the printed ratio is the point: at
  * 100 TB the postings tree is the corpus-sized artifact, and a
  * search that reads all of it is a batch job, not a query.
  */
object PostingsStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-postings-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = sys.env.getOrElse("SPARK_GRAFT_POST_DOCS", "1000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val dir = java.nio.file.Files.createTempDirectory("postings-stress").toString
    val terms = Seq("t7", "t42", "t999")

    val batches = 4
    (0 until batches).foreach { b =>
      val docs = spark.range(b * nDocs / batches, (b + 1) * nDocs / batches)
        .select(col("id").as("doc_id"), concat_ws(" ", expr(
          "transform(sequence(0, 24)," +
            " j -> concat('t', pmod(xxhash64(id, j), 10000)))")).as("text"))
      IncrementalPostings.processBatch(docs, dir, b.toLong)
    }

    def time(run: => Array[org.apache.spark.sql.Row]): (Seq[(Long, Double)], Double) = {
      val samples = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val rows = run
        (rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
          (System.nanoTime() - t0) / 1e9)
      }
      (samples.head._1, samples.map(_._2).min)
    }

    val (prunedRows, prunedSec) = time {
      IncrementalPostings.search(spark, dir, terms, 20).collect()
    }
    val (fullRows, fullSec) = time {
      val stats = spark.read.parquet(s"$dir/stats")
        .agg(sum(col("n_docs")).cast("long").as("n"),
          (sum(col("sum_dl")).cast("double") / sum(col("n_docs"))).as("avgdl"))
      val postings = spark.read.parquet(s"$dir/postings")
        .filter(col("term").isin(terms: _*)) // NO bucket partition filter
        .select(col("doc_id"), col("term"), col("tf"), col("dl"))
      Bm25.rank(postings, stats, 20).collect()
    }
    assert(prunedRows == fullRows,
      s"pruned and full-scan searches disagree: ${prunedRows.take(3)} vs ${fullRows.take(3)}")

    val allLeaves = spark.read.parquet(s"$dir/postings")
      .select("batch", "term_bucket").distinct().count()
    val probed = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(IncrementalPostings.NB)))
      .as[Long].collect().distinct.length
    println(f"""{"metric":"postings_stress","docs":$nDocs,""" +
      f""""leaves_total":$allLeaves,"buckets_probed":$probed,""" +
      f""""pruned_sec":$prunedSec%.3f,"full_scan_sec":$fullSec%.3f,""" +
      f""""speedup":${fullSec / prunedSec}%.2f}""")
    spark.stop()
  }
}
