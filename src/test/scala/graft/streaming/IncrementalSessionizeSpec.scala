package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streamed closed-session multiset must equal batch q_sessionize
  * exactly — sessions straddling micro-batch boundaries merge, gaps
  * inside one batch split, and the idle-timeout path closes whatever
  * the corpus leaves open (driven by watermark-advancing sentinels). */
class IncrementalSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Sentinel = 999999L

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def streamed(nBatches: Int): Set[(Long, Long, Long, Long, Double)] = {
    val evs = IncrementalSessionize
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val maxSeq = evs.map(_.seq).max
    val ms = MemoryStream[IncrementalSessionize.SEv](spark)
    val input = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalSessionize.SEv]
    val name = s"sess_${System.nanoTime()}"
    val q = IncrementalSessionize.sessions(input)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // two sentinel batches: the first advances the watermark past
      // every real session's close point, the second gives the engine
      // a batch in which those timeouts FIRE (timeouts fire for keys
      // without data once the watermark has moved)
      ms.addData(Seq(IncrementalSessionize.SEv(
        Sentinel, maxSeq + 4L * IncrementalSessionize.GapUs, 0L, 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(IncrementalSessionize.SEv(
        Sentinel, maxSeq + 5L * IncrementalSessionize.GapUs, 1L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[IncrementalSessionize.Session].collect()
      .filter(_.user_id != Sentinel)
      .map(s => (s.user_id, s.start_us, s.end_us, s.n_events, r6(s.sum_value)))
      .toSet
  }

  private def batchSessions: Set[(Long, Long, Long, Long, Double)] =
    graft.SparkEntry.queries("q_sessionize")(spark, sfDir)
      .select(col("user_id"),
        unix_micros(col("session_start").cast("timestamp")).as("s"),
        unix_micros(col("session_end").cast("timestamp")).as("e"),
        col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4, r6(r._5))).toSet

  test("streamed closed sessions == batch q_sessionize across 5 batches") {
    assert(streamed(nBatches = 5) === batchSessions)
  }

  test("single batch also matches (gap splits happen in-batch)") {
    assert(streamed(nBatches = 1) === batchSessions)
  }
}
