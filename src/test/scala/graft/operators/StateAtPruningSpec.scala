package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 verdict #4: q_state_at's scaladoc claims time-partitioning
  * makes point-in-time reconstruction cheap at 100 TB; this spec
  * proves it on disk. Events written `partitionBy(day)`, the same
  * T-filter run through PointInTime.stateAt with the day predicate —
  * the finalized plan's scan must select only the partitions ≤ T
  * (plan-level, via FileSourceScanExec.selectedPartitions), and the
  * answer must be bit-identical to the flat-table path.
  */
class StateAtPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"
  private val T = lit("2024-01-15 00:00:00").cast("timestamp_ntz")

  private def scanPartitionCounts(df: DataFrame): Seq[Int] = {
    df.collect() // finalize the adaptive plan
    def finalize(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      finalize(p).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
    scans(df.queryExecution.executedPlan).map(_.selectedPartitions.partitionCount)
  }

  test("day-partitioned history: the T-filter prunes partitions > T at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("stateat").toString
    val events = graft.table(spark, sfDir, "events")
    events.withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(s"$dir/hist")
    val hist = spark.read.parquet(s"$dir/hist")

    val totalDays = hist.select("day").distinct().count()
    val daysLeqT = hist.select("day").distinct()
      .filter(col("day") <= to_date(T)).count()
    assert(daysLeqT < totalDays,
      s"corpus must span past T for the test to mean anything " +
        s"($daysLeqT of $totalDays days <= T)")

    val pruned = PointInTime.stateAt(hist, "user_id", "ts", "event_id", T,
      day = Some("day"))
    val counts = scanPartitionCounts(pruned)
    assert(counts.nonEmpty, "no FileSourceScanExec found in the finalized plan")
    // every scan of the history reads exactly the <=T partitions
    assert(counts.forall(_ == daysLeqT),
      s"scan read partitions $counts, expected $daysLeqT of $totalDays")
    info(s"scan reads $daysLeqT of $totalDays day-partitions " +
      f"(pruning ratio ${totalDays.toDouble / daysLeqT}%.1fx at T; " +
      "grows with history depth)")

    // pruning changed the I/O, never the answer: bit-identical to the
    // flat-table q_state_at path
    val flat = PointInTime.stateAt(events, "user_id", "ts", "event_id", T)
      .select("user_id", "event_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    val got = pruned.select("user_id", "event_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got == flat)
  }
}
