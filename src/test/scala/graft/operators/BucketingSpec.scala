package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: both fact tables bucketed+sorted on
  * the join key join with NO exchange — the layout that turns the
  * biggest shuffle at 100 TB (fact-fact joins) into a local merge. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans without a shuffle") {
    val sfDir = "/root/testdata/sf0.001"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert(warehouse.nonEmpty)

    graft.table(spark, sfDir, "lineitem")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    graft.table(spark, sfDir, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_totalprice")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // correctness unchanged vs the plain join
      val expected = graft.table(spark, sfDir, "lineitem")
        .join(graft.table(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
