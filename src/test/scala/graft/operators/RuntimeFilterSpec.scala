package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the 100 TB shuffle-join killer
  * feature Spark ships (SPARK-32268): when a dimension side carries a
  * selective predicate, Catalyst injects a `might_contain` bloom test
  * on the fact side's join key, so most fact rows drop at the SCAN
  * before paying the shuffle. This spec pins (a) the injection fires
  * on a parquet fact/dim shuffle join under the documented thresholds,
  * and (b) the answer is bit-identical with the feature off — the
  * filter only prunes rows the join would drop anyway.
  *
  * Thresholds are session-scoped and restored in finally; the
  * application-side scan threshold is lowered because the test corpus
  * is far below the 10 GB production default (the POINT of the default:
  * only fact scans big enough to matter pay the bloom build).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val confs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")

  private def withConfs[A](pairs: Seq[(String, String)])(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def query(dir: String) = {
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("p_size") === 1)
    fact.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), graft.sumExact(col("l_quantity")).as("qty"))
  }

  test("bloom might_contain injects on the fact side and preserves the answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf")
      .toFile.getAbsolutePath
    graft.table(spark, "/root/testdata/sf0.01", "lineitem")
      .write.mode("overwrite").parquet(s"$dir/fact")
    graft.table(spark, "/root/testdata/sf0.01", "part")
      .write.mode("overwrite").parquet(s"$dir/dim")

    val (plan, withBloom) = withConfs(confs) {
      val q = query(dir)
      (q.queryExecution.optimizedPlan.toString, q.collect().toSet)
    }
    assert(plan.contains("might_contain"),
      s"expected an injected bloom runtime filter:\n${plan.take(1500)}")

    val without = withConfs(confs.updated(1,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
      query(dir).collect().toSet
    }
    assert(withBloom == without)
    assert(withBloom.nonEmpty)
  }
}
