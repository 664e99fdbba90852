package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what skew actually costs — and which mitigation pays for it.
  *
  * Synthetic workload: a fact table where one key owns 90% of the rows
  * (the classic hot-partition shape AQE's skew stats report at runtime)
  * joined to / aggregated by that key. Legs timed, same result rows:
  *
  *   join_smj_aqe      MERGE-hinted sort-merge join, AQE skew split ON
  *                     (the engine's default posture)
  *   join_smj_noskew   same join, AQE skew split OFF (what a pipeline
  *                     faces when skew split can't apply — e.g. the
  *                     join output must keep a required distribution)
  *   join_salted       Skew.saltedBroadcastJoin (fact salted, dim
  *                     replicated per salt, broadcast)
  *   agg_direct        groupBy(hot key).sum — partial aggregation is
  *                     expected to neutralize skew here; the leg exists
  *                     to MEASURE that claim, not to assume it
  *   agg_salted        Skew.saltedAgg two-phase variant
  *
  * Prints one JSON line per leg (median of SPARK_GRAFT_BENCH_RUNS,
  * default 3) plus a ratio summary. Row counts are cross-checked so a
  * "fast" leg that silently computes something else fails loudly.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nFact = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val nDim = 100000L
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val buckets = cpus.toInt

    // 90% of fact rows carry key 0; the rest spread over the dim's key
    // space. Payload column makes the shuffle carry real bytes.
    def fact = spark.range(nFact).select(
      when(col("id") % 10 < 9, lit(0L))
        .otherwise(pmod(col("id"), lit(nDim))).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    def dim = spark.range(nDim).select(
      col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

    def timeLeg(name: String, skewSplit: Boolean)(build: => DataFrame): (String, Double, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val rows = build.count()
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      println(s"""{"leg":"$name","median_sec":$median,"min_sec":${times.head},"rows":$rows}""")
      (name, median, rows)
    }

    val legs = Seq(
      timeLeg("join_smj_aqe", skewSplit = true) {
        fact.hint("merge").join(dim.hint("merge"), "k")
      },
      timeLeg("join_smj_noskew", skewSplit = false) {
        fact.hint("merge").join(dim.hint("merge"), "k")
      },
      timeLeg("join_salted", skewSplit = false) {
        graft.operators.Skew.saltedBroadcastJoin(fact, dim, "k", col("v"), buckets)
      },
      timeLeg("agg_direct", skewSplit = true) {
        fact.groupBy("k").agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      },
      timeLeg("agg_salted", skewSplit = true) {
        graft.operators.Skew.saltedAgg(fact, "k", col("v"), col("v"), buckets)
      })

    val m = legs.map(l => l._1 -> l._2).toMap
    val joinRows = legs.filter(_._1.startsWith("join")).map(_._3).distinct
    val aggRows = legs.filter(_._1.startsWith("agg")).map(_._3).distinct
    require(joinRows.size == 1, s"join legs disagree on rows: $joinRows")
    require(aggRows.size == 1, s"agg legs disagree on rows: $aggRows")
    println(f"""{"summary":"skew","rows":$nFact,"hot_share":0.9,"salted_vs_noskew_speedup":${m("join_smj_noskew") / m("join_salted")}%.2f,"aqe_vs_noskew_speedup":${m("join_smj_noskew") / m("join_smj_aqe")}%.2f,"agg_salted_vs_direct":${m("agg_direct") / m("agg_salted")}%.2f}""")
    spark.stop()
  }
}
