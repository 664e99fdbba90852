package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed gap-moment fold must equal batch q_burstiness EXACTLY —
  * the moments are integer sums, so unlike the EWMA twin there is no
  * IEEE caveat to argue: any discrepancy is a fold bug (a dropped or
  * double-charged cross-batch gap). */
class IncrementalBurstinessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Latest-per-key moments after streaming the corpus in nBatches
    * time-ordered slices. */
  private def streamed(nBatches: Int): Map[Long, (Long, Long, Long)] = {
    val evs = IncrementalBurstiness
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalBurstiness.Ev](spark)
    val name = s"burst_${System.nanoTime()}"
    val q = IncrementalBurstiness.moments(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalBurstiness.BurstRow].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        val last = rows.maxBy(_.n) // update mode: keep latest
        u -> (last.n, last.s, last.q)
      }
  }

  /** Batch-derived per-user moments (the q_burstiness CTE `m`, before
    * the histogram) — the independent derivation the stream must hit. */
  private def batchMoments(): Map[Long, (Long, Long, Long)] = {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP))", "event_id")
      .as[(Long, Long, Long)].collect()
    evs.groupBy(_._1).map { case (u, rows) =>
      val secs = rows.sortBy(r => (r._2, r._3))
        .map(r => Math.floorDiv(r._2, 1000000L)).toIndexedSeq
      val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
      u -> ((gaps.size.toLong, gaps.sum, gaps.map(g => g * g).sum))
    }
  }

  test("streamed moments == batch gaps, exactly, across 4 batches") {
    val batch = batchMoments()
    val stream = streamed(nBatches = 4)
    assert(stream.keySet === batch.keySet)
    batch.foreach { case (u, m) =>
      assert(stream(u) === m, s"user $u: streamed ${stream(u)} != batch $m")
    }
  }

  test("split-invariance: 1 batch == 7 batches") {
    assert(streamed(nBatches = 1) === streamed(nBatches = 7))
  }

  test("histogram over streamed state == q_burstiness") {
    val rows = streamed(nBatches = 3).toSeq
      .map { case (u, (n, s, q)) => (u, n, s, q) }
      .toDF("user_id", "n", "s", "q")
    val got = IncrementalBurstiness.histogram(rows)
      .as[(Long, Long)].collect().toMap
    val expect = graft.SparkEntry.queries("q_burstiness")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got === expect)
  }

  test("eviction: idle key drops, reappears cold; active key unaffected") {
    val ms = MemoryStream[IncrementalBurstiness.Ev](spark)
    val name = s"burst_ev_${System.nanoTime()}"
    // wire through a watermark: eviction needs event-time progress
    // (the StateEvictionSpec pattern — the extra column is tolerated
    // by the downstream bean encoder)
    val withWm = ms.toDS()
      .withColumn("ets", org.apache.spark.sql.functions.expr(
        "timestamp_micros(seq)"))
      .withWatermark("ets", "0 seconds")
      .as[IncrementalBurstiness.Ev]
    val q = IncrementalBurstiness.moments(withWm, evictAfterMs = Some(60000L))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    // base the timeline away from epoch (round-9 funnel lesson: a first
    // event AT the initial zero watermark is dropped as late)
    val base = 86400L * 1000000L * 100
    def sec(k: Long) = base + k * 1000000L
    try {
      ms.addData(Ev(1, sec(0), 1), Ev(2, sec(0), 2))
      q.processAllAvailable()
      ms.addData(Ev(1, sec(10), 3), Ev(2, sec(10), 4))
      q.processAllAvailable()
      // key 2 goes idle; key 1 keeps advancing the watermark past 2's TTL
      ms.addData(Ev(1, sec(200), 5))
      q.processAllAvailable()
      ms.addData(Ev(1, sec(400), 6))
      q.processAllAvailable()
      // key 2 reappears: must restart cold (its 390 s absence gap NOT charged)
      ms.addData(Ev(2, sec(400), 7), Ev(2, sec(410), 8))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[IncrementalBurstiness.BurstRow].collect()
    val k2 = rows.filter(_.user_id == 2).maxBy(_.n)
    // cold restart: one 10 s gap, not (10 s + the pre-eviction history)
    assert(k2 === IncrementalBurstiness.BurstRow(2, 1, 10, 100), k2)
    val k1 = rows.filter(_.user_id == 1).maxBy(_.n)
    assert(k1 === IncrementalBurstiness.BurstRow(1, 3,
      10 + 190 + 200, 10L * 10 + 190L * 190 + 200L * 200), k1)
  }

  private def Ev(u: Long, seq: Long, sub: Long) =
    IncrementalBurstiness.Ev(u, seq, sub)
}
