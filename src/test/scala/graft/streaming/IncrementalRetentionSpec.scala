package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The folded signed deltas must equal batch q_retention under an
  * ARBITRARY-order feed (no in-order contract — that's the point of
  * the retraction design), and the folded triangle must be invariant
  * to the micro-batch split. */
class IncrementalRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(evs: Seq[IncrementalRetention.REv],
      nBatches: Int): Seq[IncrementalRetention.Delta] = {
    val ms = MemoryStream[IncrementalRetention.REv](spark)
    val name = s"retention_${System.nanoTime()}"
    val q = IncrementalRetention.deltas(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalRetention.Delta].collect().toSeq
  }

  private def fold(ds: Seq[IncrementalRetention.Delta]) =
    ds.groupBy(d => (d.cohort_day, d.days_since)).view
      .mapValues(_.map(_.delta.toLong).sum).toMap.filter(_._2 > 0)

  test("shuffled feed folds to batch q_retention; split-invariant") {
    val evs = IncrementalRetention
      .fromEvents(graft.table(spark, sfDir, "events")).collect()
    // deterministic shuffle that guarantees out-of-order arrival: the
    // md5-keyed order is uncorrelated with time, so some user's
    // earliest day lands in a later micro-batch and forces retractions
    val shuffled = evs.sortBy(e =>
      java.util.UUID.nameUUIDFromBytes(
        s"${e.user_id}:${e.day}".getBytes).toString)
    val deltas = streamed(shuffled.toSeq, nBatches = 5)
    assert(deltas.exists(_.delta == -1),
      "the shuffled feed must actually exercise a cohort retraction")

    val batch = graft.SparkEntry.queries("q_retention")(spark, sfDir)
      .selectExpr("unix_date(cohort_day)", "CAST(days_since AS INT)", "n_users")
      .as[(Int, Int, Long)].collect()
      .map { case (c, a, n) => (c, a) -> n }.toMap
    assert(fold(deltas) == batch)

    // one-batch feed: no retractions possible, same folded triangle
    val one = streamed(shuffled.toSeq, nBatches = 1)
    assert(one.forall(_.delta == 1))
    assert(fold(one) == batch)
  }

  test("triangle() helper matches batch columns and values") {
    val evs = IncrementalRetention
      .fromEvents(graft.table(spark, sfDir, "events")).collect()
    val deltas = streamed(evs.toSeq, nBatches = 3)
    val got = IncrementalRetention.triangle(deltas.toDS().toDF())
      .selectExpr("CAST(cohort_day AS STRING)", "days_since", "n_users")
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.SparkEntry.queries("q_retention")(spark, sfDir)
      .selectExpr("CAST(cohort_day AS STRING)", "days_since", "n_users")
      .as[(String, Long, Long)].collect().toSet
    assert(got == batch)
  }
}
