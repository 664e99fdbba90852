package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query and
  * total wall seconds over SPARK_GRAFT_SF_DIR.
  *
  * Session tuning mirrors what a cluster deployment would set: shuffle
  * partitions sized to cores (not the 200 default), AQE on (runtime
  * coalescing + skew-join splitting — the local stand-in for what keeps
  * 1000-executor shuffles balanced). A warmup query runs first so JVM /
  * codegen / FileSourceScan initialization isn't billed to whichever
  * query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (file listing + footer reads) and
    // force one codegen'd aggregation through the pipeline.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => table(spark, sfDir, t).limit(1).count())
    SparkEntry.queries.get("q_agg_pricing").foreach(_(spark, sfDir).count())

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
