package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-4 coverage queries beyond the DuckDB
  * hash-gate: the binned range join against its naive formulation, the
  * gap-fill on a deliberately gappy frame, the bloom pre-filter's
  * exactness, and the z-score flags against a driver-side reference. */
class Coverage4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sfDir = "/root/testdata/sf0.001"

  test("binned range join returns exactly the naive theta-join result") {
    val binned = graft.SparkEntry.queries("q_range_join")(spark, sfDir)
    val li = graft.table(spark, sfDir, "lineitem")
    val pt = graft.table(spark, sfDir, "part")
    val naive = pt.join(li,
        li("l_extendedprice") >= pt("p_retailprice") - 5 &&
        li("l_extendedprice") <= pt("p_retailprice") + 5)
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_items"),
        graft.sumExact(col("l_extendedprice")).as("sum_price"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("binned range join plans an equi-join on the bin key, not a nested loop") {
    val plan = graft.SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("gap-fill zero-fills missing (type, day) cells on a gappy frame") {
    // Type "b" is absent on the middle day; the grid must still carry it.
    val gappy = Seq(
      ("a", "2024-01-01 10:00:00"), ("b", "2024-01-01 11:00:00"),
      ("a", "2024-01-02 10:00:00"),
      ("a", "2024-01-03 10:00:00"), ("b", "2024-01-03 11:00:00"))
      .toDF("event_type", "tss")
      .select(col("event_type"), col("tss").cast("timestamp_ntz").as("ts"))
    val counts = gappy.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val days = gappy.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val types = gappy.select(col("event_type")).distinct()
    val filled = broadcast(types).crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).cast("long").as("cnt"))
    assert(filled.count() === 6) // 2 types × 3 days
    val bMissing = filled.filter(col("event_type") === "b" &&
      col("day") === to_date(lit("2024-01-02"))).select("cnt").head().getLong(0)
    assert(bMissing === 0L)
    assert(filled.agg(sum("cnt")).head().getLong(0) === 5L)
  }

  test("bloom-prefiltered decontamination equals the unfiltered join exactly") {
    val plain = graft.SparkEntry.queries("q_decontaminate")(spark, sfDir)
    val bloomed = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sfDir)
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("z-score flags exactly the rows beyond 3 sample standard deviations") {
    val flagged = graft.SparkEntry.queries("q_anomaly_zscore")(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    val rows = graft.table(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val expected = rows.groupBy(_._2).flatMap { case (_, g) =>
      val n = g.length
      val mean = g.map(_._3).sum / n
      val variance = (g.map(v => v._3 * v._3).sum / n - mean * mean) * n / (n - 1)
      val sd = math.sqrt(variance)
      g.filter(r => math.abs(
        BigDecimal((r._3 - mean) / sd).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) > 3).map(_._1).toSeq
    }.toSet
    assert(flagged === expected)
  }

  test("bigram probabilities sum to ~1 per conditioning token over kept rows' parents") {
    // p(w2|w1) over ALL bigrams of w1 sums to 1; the emitted model keeps
    // cnt >= 3 rows, so per-w1 sums must be ≤ 1 and the probabilities
    // consistent with the counts.
    val lm = graft.SparkEntry.queries("q_bigram_lm")(spark, sfDir)
    val bad = lm.filter(abs(col("p") * col("cnt") / col("cnt") - col("p")) > 1e-12)
    assert(bad.isEmpty)
    val sums = lm.groupBy("w1").agg(sum("p").as("sp")).filter(col("sp") > 1.0 + 1e-9)
    assert(sums.isEmpty, "per-w1 kept probability mass exceeded 1")
  }
}
