package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the round-7 two-phase window replacements on synthetic
  * data at stress scale:
  *
  *  - global rank (q_shuffle_det): `row_number() OVER (ORDER BY key)`
  *    — ONE task sorts the entire corpus — vs `plans.ShuffleRank`
  *    (256 leading-byte buckets, partitioned intra-bucket windows);
  *  - per-key running totals (q_token_budget): `sum(v) OVER
  *    (PARTITION BY source ORDER BY key)` with FEW keys — k tasks
  *    each scanning 1/k of the corpus — vs `plans.PrefixSum`
  *    (segmented cumulative sums, (key × 256)-way parallel).
  *
  * Both formulations must return identical rows (asserted); prints one
  * JSON line per leg plus speedup ratios. The absolute ratio on a
  * single host understates the cluster gap: locally the single sort
  * task and the parallel plan share one machine's memory bandwidth,
  * while on 1000 executors the naive plans still run ONE task (or k)
  * no matter the cluster size.
  */
object RankStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rank-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_RANK_ROWS", "5000000").toLong
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_RANK_KEYS", "5").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    def docs = spark.range(n).select(
      col("id"),
      concat(lit("src"), pmod(col("id"), lit(nKeys)).cast("string"))
        .as("source"),
      (pmod(xxhash64(col("id"), lit(3)), lit(97)) + 1).as("v"),
      md5(col("id").cast("string").cast("binary")).as("key"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1000000)) / lit(1000.0))
        .as("ord"))

    // time a full-result reduction, NOT count(): row_number/sum windows
    // don't change cardinality, so count() lets Catalyst prune the
    // whole Window operator and the naive legs would measure an empty
    // plan. Summing the computed column forces every rank/total to be
    // produced.
    def time(name: String, valueCol: String)(build: => DataFrame): Double = {
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build.agg(sum(col(valueCol))).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      println(s"""{"leg":"$name","median_sec":$median,"min_sec":${times.head}}""")
      median
    }

    // ---- global rank ------------------------------------------------------
    def rankNaive(d: DataFrame): DataFrame = {
      val w = Window.orderBy("key")
      d.withColumn("pos", (row_number().over(w) - 1).cast("long"))
        .select("id", "pos")
    }
    def rankSegmented(d: DataFrame): DataFrame =
      graft.plans.ShuffleRank.rank(d, col("key"), "pos").select("id", "pos")

    var diff = rankNaive(docs).exceptAll(rankSegmented(docs)).count() +
      rankSegmented(docs).exceptAll(rankNaive(docs)).count()
    require(diff == 0, s"rank plans disagree on $diff rows")
    val tRankOld = time("rank_global_window", "pos")(rankNaive(docs))
    val tRankNew = time("rank_segmented", "pos")(rankSegmented(docs))

    // ---- per-key running totals -------------------------------------------
    def prefixNaive(d: DataFrame): DataFrame = {
      val w = Window.partitionBy("source").orderBy("key", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cum", sum(col("v")).over(w)).select("id", "cum")
    }
    def prefixSegmented(d: DataFrame): DataFrame =
      graft.plans.PrefixSum.perKey(d, "source", col("key"), "id",
        col("v"), "cum").select("id", "cum")

    diff = prefixNaive(docs).exceptAll(prefixSegmented(docs)).count() +
      prefixSegmented(docs).exceptAll(prefixNaive(docs)).count()
    require(diff == 0, s"prefix plans disagree on $diff rows")
    val tPfxOld = time(s"prefix_${nKeys}key_window", "cum")(prefixNaive(docs))
    val tPfxNew = time("prefix_segmented", "cum")(prefixSegmented(docs))

    // ---- value-ordered running max (q_record_highs's shape) ---------------
    // Unlike the hash orders above, the order key here is a DATA value
    // (range-bucketed via width_bucket) — the OrderedPrefix plan.
    def rmaxNaive(d: DataFrame): DataFrame = {
      val w = Window.orderBy("ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("rm", max(col("v")).over(w)).select("id", "rm")
    }
    def rmaxSegmented(d: DataFrame): DataFrame =
      graft.plans.OrderedPrefix.runningMax(d, Nil, col("ord"), col("id"),
        col("v"), "rm").select("id", "rm")

    diff = rmaxNaive(docs).exceptAll(rmaxSegmented(docs)).count() +
      rmaxSegmented(docs).exceptAll(rmaxNaive(docs)).count()
    require(diff == 0, s"running-max plans disagree on $diff rows")
    val tMaxOld = time("runningmax_global_window", "rm")(rmaxNaive(docs))
    val tMaxNew = time("runningmax_rangebucketed", "rm")(rmaxSegmented(docs))

    // ---- value-ordered running max under HEAVY skew -----------------------
    // 90% of rows share one order value — the distribution that
    // collapsed the old width_bucket bounds into a single bucket.
    // Equi-depth composite (ord, tie) cutoffs must keep the two-phase
    // ratio alive here, not just on spread orders. The tiebreaker is
    // the md5 `key` (OrderedPrefix's tie is type-generic), NOT `id`:
    // with tie=id the mode rows arrive already id-sorted, so the naive
    // single-task sort gets near-linear TimSort runs as a generation
    // artifact — real skewed orders don't ship a presorted tiebreaker.
    def skewed = docs.withColumn("ord",
      when(pmod(col("id"), lit(10)) < 9, lit(1234.5)).otherwise(col("ord")))
    def rmaxSkewNaive(d: DataFrame): DataFrame = {
      val w = Window.orderBy("ord", "key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("rm", max(col("v")).over(w)).select("id", "rm")
    }
    def rmaxSkewSegmented(d: DataFrame): DataFrame =
      graft.plans.OrderedPrefix.runningMax(d, Nil, col("ord"), col("key"),
        col("v"), "rm").select("id", "rm")
    diff = rmaxSkewNaive(skewed).exceptAll(rmaxSkewSegmented(skewed)).count() +
      rmaxSkewSegmented(skewed).exceptAll(rmaxSkewNaive(skewed)).count()
    require(diff == 0, s"skewed running-max plans disagree on $diff rows")
    val tSkewOld = time("runningmax_skew_global_window", "rm")(rmaxSkewNaive(skewed))
    val tSkewNew = time("runningmax_skew_equidepth", "rm")(rmaxSkewSegmented(skewed))

    println(f"""{"summary":"rank_stress","rows":$n,"keys":$nKeys,"rank_speedup":${tRankOld / tRankNew}%.2f,"prefix_speedup":${tPfxOld / tPfxNew}%.2f,"runningmax_speedup":${tMaxOld / tMaxNew}%.2f,"runningmax_skew_speedup":${tSkewOld / tSkewNew}%.2f}""")
    spark.stop()
  }
}
