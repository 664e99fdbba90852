package graft.streaming

import org.apache.spark.sql.SparkSession

/** CLI: continuously dedup a growing corpus directory.
  * `runMain graft.streaming.DedupRun <docsDir(parquet)> <workDir> [threshold]`
  * — each parquet file that appears in docsDir is one micro-batch of
  * (doc_id, text); near-dup pairs (vs the batch and all history) are
  * appended to <workDir>/dups and printed at the end.
  */
object DedupRun {
  def main(args: Array[String]): Unit = {
    val docsDir = args(0)
    val workDir = args(1)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-incremental-dedup")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .parquet(docsDir)
    val q = IncrementalDedup.start(docs, s"$workDir/index", s"$workDir/dups",
      s"$workDir/ckpt", IncrementalDedup.Config(threshold = threshold))
    q.processAllAvailable()
    q.stop()

    val dups = spark.read.parquet(s"$workDir/dups")
    println(s"=== near-duplicate pairs (threshold $threshold) ===")
    dups.orderBy("d1", "d2").show(100, truncate = false)
    println(s"total: ${dups.count()} pairs")
    spark.stop()
  }
}
