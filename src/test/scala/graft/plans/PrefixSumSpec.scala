package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum.perKey must produce each row's exact inclusive running
  * total in (ord, tie) order within its key while never running a
  * key-sized sequential window — pinned against a brute-force fold,
  * under adversarial repartitionings, and on bucket-degenerate keys.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (id, key, value) with a deterministic non-uniform value. */
  private def mkRows(n: Int, keys: Int) =
    spark.range(n).select(
      col("id"),
      concat(lit("k"), (col("id") % keys).cast("string")).as("key"),
      ((col("id") * 7) % 13 + 1).as("v"))

  private def brute(n: Int, keys: Int): Map[Long, Long] =
    (0L until n).map(id => (id, s"k${id % keys}", (id * 7) % 13 + 1))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
          .scanLeft((0L, 0L)) { case ((_, acc), (id, _, v)) => (id, acc + v) }
          .drop(1)
      }.toMap

  test("running total == brute-force per-key fold in md5 order") {
    val got = PrefixSum.perKey(mkRows(4000, 5), "key",
        md5(col("id").cast("string").cast("binary")), "id", col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == brute(4000, 5))
  }

  test("output invariant under input partitioning") {
    val base = mkRows(3000, 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      PrefixSum.perKey(df, "key",
          md5(col("id").cast("string").cast("binary")), "id", col("v"), "cum")
        .select("id", "cum").as[(Long, Long)].collect().toSet
    assert(run(base.repartition(1)) == run(base.repartition(17, col("v"))))
    assert(run(base.orderBy(col("id").desc)) == run(base))
  }

  test("degenerate ord collapsing to one bucket still sums completely") {
    // every ord shares the leading byte — one bucket takes everything
    val df = mkRows(2000, 2).withColumn("ord",
      concat(lit("00"), md5(col("id").cast("string").cast("binary"))))
    val got = PrefixSum.perKey(df, "key", col("ord"), "id", col("v"), "cum")
      .groupBy("key").agg(max("cum").as("total"))
      .as[(String, Long)].collect().toMap
    val expect = (0L until 2000L).map(id => (s"k${id % 2}", (id * 7) % 13 + 1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(got == expect)
  }

  test("every window in the plan is partitioned; offsets are broadcast") {
    val pfx = PrefixSum.perKey(mkRows(1000, 4), "key",
      md5(col("id").cast("string").cast("binary")), "id", col("v"), "cum")
    val plan = pfx.queryExecution.optimizedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    // both windows carry a partition spec (key / key+bucket) — no
    // empty-partition window anywhere, unlike ShuffleRank's bounded
    // count table this plan never needs one
    windows.foreach(w => assert(w.contains("key"),
      s"window must partition by key: $w"))
    assert(plan.contains("_ps_bucket"),
      s"expected bucketed structure:\n${plan.take(800)}")
  }
}
