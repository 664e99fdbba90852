package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the round-8 bloom-probe replacement at stress scale: the
  * old Scala-UDF-over-broadcast probe (per-row Long boxing, split
  * whole-stage span) vs `graft.functions.BloomProbe` (codegen'd inline
  * `mightContainLong`, broadcast handle, span intact) — the shape
  * q_decontaminate_bloom runs at the scan of the 100 TB training side.
  *
  * Both legs must keep the identical row count (the filter's verdicts
  * are the same function — only the invocation machinery differs);
  * prints one JSON line per leg plus the ratio. Local caveat: a pure
  * scan-side filter is memory-bandwidth-bound on one host, so the
  * measured gap understates the cluster win where the probe competes
  * with decode/shuffle CPU, not just bandwidth.
  */
object BloomStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bloom-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_BLOOM_ROWS", "50000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    // the real query's filter geometry: 4M-capacity 1% filter, probed
    // by a corpus whose true-hit rate is ~10% (eval docs are 1 in 10)
    val bloom = org.apache.spark.util.sketch.BloomFilter
      .create(4L * 1024 * 1024, 0.01)
    var k = 0L
    while (k < 4L * 1024 * 1024) { bloom.putLong(k * 10L); k += 1 }

    def probes = spark.range(n)
      .select(xxhash64(col("id")).as("raw"))
      // ~10% of rows are planted members (multiples of 10 within the
      // inserted range), the rest random 64-bit values
      .select(when(pmod(col("raw"), lit(10L)) === 0,
          pmod(abs(col("raw")), lit(4L * 1024 * 1024)) * 10L)
        .otherwise(col("raw")).as("h"))

    def time(name: String)(build: => DataFrame): Double = {
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build.agg(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      println(s"""{"leg":"$name","median_sec":$median,"min_sec":${times.head}}""")
      median
    }

    // old shape: Scala UDF over an explicit broadcast (exactly what
    // q_decontaminate_bloom shipped before round 8)
    val bc = spark.sparkContext.broadcast(bloom)
    val udfProbe = udf((h: Long) => bc.value.mightContain(h))
    def legUdf = probes.filter(udfProbe(col("h")))
    def legExpr = probes.filter(
      graft.functions.BloomExpressions.probe(spark, bloom, col("h")))

    val kept = legUdf.count()
    val keptExpr = legExpr.count()
    require(kept == keptExpr,
      s"probe verdicts disagree: udf=$kept expr=$keptExpr")
    println(s"""{"rows":$n,"kept":$kept}""")

    val tUdf = time("bloom_udf_broadcast")(legUdf)
    val tExpr = time("bloom_codegen_probe")(legExpr)
    println(f"""{"metric":"bloom_probe_speedup","value":${tUdf / tExpr}%.2f}""")
    spark.stop()
  }
}
