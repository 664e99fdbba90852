package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the q_skyline rewrite (round 6): unpartitioned running-max
  * window vs the two-phase segmented prefix max, on a synthetic table
  * whose price column is near-continuous (distinct ≈ rows — the shape
  * that made the old plan a scale-killer: the whole reduction funneled
  * into ONE task).
  *
  * Both formulations must return identical skyline rows (asserted);
  * prints one JSON line per leg plus the speedup ratio.
  */
object SkylineStress {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skyline-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_SKYLINE_ROWS", "5000000").toLong
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

    // near-continuous price (hash-derived double: ~n distinct values),
    // date dimension with enough repetition that the skyline is small
    def orders = spark.range(n).select(
      col("id").as("o_orderkey"),
      (pmod(xxhash64(col("id")), lit(1000000000L)).cast("double") / 100.0)
        .as("o_totalprice"),
      date_add(lit("1995-01-01").cast("date"),
        pmod(xxhash64(col("id"), lit(7)), lit(2400)).cast("int"))
        .as("o_orderdate"))

    def oldPlan(o: DataFrame): DataFrame = {
      val byPrice = o.groupBy("o_totalprice")
        .agg(max(col("o_orderdate")).as("mx_date"))
      val w = Window.orderBy(col("o_totalprice").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val run = byPrice.withColumn("best_higher", max(col("mx_date")).over(w))
      val dominated =
        coalesce(col("best_higher") >= col("o_orderdate"), lit(false)) ||
          (col("mx_date") > col("o_orderdate"))
      o.join(run, "o_totalprice").filter(!dominated)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    }

    def newPlan(o: DataFrame): DataFrame =
      graft.plans.SegmentedSkyline.skyline(o, cpus.toInt.max(1))

    def time(name: String)(build: => DataFrame): Double = {
      val times = (1 to runs).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (times.size % 2 == 1) times(times.size / 2)
        else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
      println(s"""{"leg":"$name","median_sec":$median,"min_sec":${times.head}}""")
      median
    }

    // identical rows first (cheap relative to the timing loops)
    val diff = oldPlan(orders).exceptAll(newPlan(orders)).count() +
      newPlan(orders).exceptAll(oldPlan(orders)).count()
    require(diff == 0, s"plans disagree on $diff rows")

    val tOld = time("skyline_global_window")(oldPlan(orders))
    val tNew = time("skyline_segmented")(newPlan(orders))
    println(f"""{"summary":"skyline","rows":$n,"distinct_prices":"~rows","speedup":${tOld / tNew}%.2f}""")
    spark.stop()
  }
}
