package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ShuffleRank must produce the exact global rank (0..n-1, the total
  * order of the key) while never running a data-sized unpartitioned
  * window — pinned against a brute-force sort, under adversarial
  * repartitionings, and on bucket-degenerate keys.
  */
class ShuffleRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(n: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      md5(col("id").cast("string").cast("binary")).as("key"))

  test("rank == brute-force position in key order (0..n-1, no gaps)") {
    val df = mkDocs(5000)
    val got = ShuffleRank.rank(df, col("key"), "pos")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val expect = df.select("doc_id", "key").as[(Long, String)].collect()
      .sortBy(_._2).zipWithIndex.map { case ((id, _), i) => id -> i.toLong }
      .toMap
    assert(got == expect)
  }

  test("output invariant under input partitioning") {
    val base = mkDocs(3000)
    val a = ShuffleRank.rank(base.repartition(1), col("key"), "pos")
      .as[(Long, String, Long)].collect().map(r => (r._1, r._3)).toSet
    val b = ShuffleRank.rank(base.repartition(17, col("doc_id")), col("key"), "pos")
      .as[(Long, String, Long)].collect().map(r => (r._1, r._3)).toSet
    assert(a == b)
  }

  test("degenerate keys collapsing to few buckets still rank completely") {
    // all keys share the same leading byte — one bucket takes everything
    val df = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("00"), md5(col("id").cast("string").cast("binary"))).as("key"))
    val ranks = ShuffleRank.rank(df, col("key"), "pos")
      .select("pos").as[Long].collect().sorted
    assert(ranks.toSeq == (0L until 2000L))
  }

  test("no data-sized unpartitioned window in the plan") {
    val df = mkDocs(1000)
    val ranked = ShuffleRank.rank(df, col("key"), "pos")
    val plan = ranked.queryExecution.optimizedPlan.toString
    // the only empty partitionBy window must be over the bucket-count
    // aggregate (≤256 rows), never over the raw input: assert the
    // window-over-counts structure exists and the per-row window is
    // keyed on the bucket
    assert(plan.contains("_sr_bucket"),
      s"expected bucketed window structure:\n${plan.take(800)}")
    val rowNumWindows = "row_number".r.findAllIn(plan).size
    assert(rowNumWindows == 1)
    // the row_number window is partitioned (by bucket)
    val winSpec = plan.linesIterator.find(_.contains("row_number")).get
    assert(winSpec.contains("_sr_bucket"),
      s"row_number window must partition by bucket: $winSpec")
  }
}
