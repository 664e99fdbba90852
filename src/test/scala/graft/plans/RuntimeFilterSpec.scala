package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Catalyst runtime-filter awareness: InjectRuntimeFilter plants a
  * bloom-filter (or semi-join) probe from the selective (creation) side
  * of a shuffle join into the large (application) side's scan, pruning
  * shuffle input rows before the exchange — the optimizer-level
  * mechanism that replaces hand-built scan-side bloom pushdown (cf. the
  * explicit `q_decontaminate_bloom` operator, which targets the same
  * effect where the filter source is not a join).
  *
  * The default thresholds target cluster-scale scans (application side
  * > 10 GB), so the spec lowers them to make injection observable at
  * test scale — asserting the MECHANISM exists and fires, which is what
  * a 100 TB deployment relies on.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.01"

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // let test-scale scans qualify as "large application side"
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // keep the join a shuffle join: broadcast creation sides don't
      // need a runtime filter (the broadcast itself prunes)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val part = graft.table(spark, sfDir, "part")
        .filter(col("p_type") === "PROMO" && col("p_size") <= 3)
      val li = graft.table(spark, sfDir, "lineitem")
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$optimized")
      // the filtered plan still returns correct results
      val direct = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        === direct)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
