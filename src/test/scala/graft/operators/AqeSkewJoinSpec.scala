package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join: the RUNTIME half of the skew story whose manual half
  * is `operators.Skew` (salting). Pins that Spark's
  * `spark.sql.adaptive.skewJoin` actually splits a planted-skew
  * sort-merge join in this engine's sessions — the final adaptive plan
  * carries the `skew=true` marker — and that the split changes no
  * answer (equality against the same join with the optimization off,
  * and against the manual salted-broadcast form).
  *
  * When to prefer which (SCALING.md §Joins): AQE handles skew
  * DISCOVERED AT RUNTIME on shuffle joins with zero code changes —
  * the default posture. Manual salting remains the tool when the hot
  * key is KNOWN and the join should never shuffle at all
  * (salted-broadcast), for aggregations (AQE's skew rewrite only
  * covers joins), and for stream-stream joins where AQE is disabled.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a planted-skew SMJ is split by AQE (skew=true in the final " +
      "plan) with the answer unchanged") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap

    try {
      // thresholds scaled DOWN so a local-scale hot partition counts as
      // skewed: one key holds ~90% of the fact side with ~200-byte rows
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // no broadcast: the point is the shuffle-join rewrite
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val pad = "x" * 180
      val fact = spark.range(0, 60000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("v"), lit(pad).as("pad"))
      val dim = spark.range(0, 97).select(
        col("id").as("k"), concat(lit("n"), col("id")).as("name"),
        lit(pad).as("dpad"))

      // aggregate on the DIM attribute, not the join key: a same-key
      // aggregation could reuse the join's hash partitioning, and
      // OptimizeSkewedJoin declines to split a stage whose output
      // partitioning a parent requires — the planted skew must sit in
      // a free-standing join stage to be splittable
      def joined = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

      val df = joined
      df.queryExecution.toRdd.count() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      val finalPlan = plan.indexOf("== Initial Plan ==") match {
        case -1 => plan
        case i => plan.substring(0, i)
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
      val withSplit = df.as[(String, Long, Long)].collect().toSet

      // answer invariance 1: same join, skew rewrite off
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = joined.as[(String, Long, Long)].collect().toSet
      assert(withSplit == plain, "skew split changed the answer")

      // answer invariance 2: the manual salted-broadcast form
      val salted = Skew.saltedBroadcastJoin(
          fact, dim, "k", col("v"), buckets = 8)
        .groupBy("name").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .as[(String, Long, Long)].collect().toSet
      assert(withSplit == salted, "salted form diverged")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
