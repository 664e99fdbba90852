package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed funnel-depth transitions, folded last-per-user, must
  * reproduce batch q_funnel_window's depth distribution — including
  * anchors set in one micro-batch and completed in a later one. The
  * eviction path is pinned separately: bounded state under churn and
  * the documented cold-restart divergence. */
class IncrementalFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** depth histogram from the stream: last depth per emitting user,
    * depth-0 = users in the corpus that never emitted. */
  private def streamed(nBatches: Int): Map[Long, Long] = {
    val evs = IncrementalFunnel
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalFunnel.FEv](spark)
    val name = s"funnel_${System.nanoTime()}"
    val q = IncrementalFunnel.depths(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table(name).as[IncrementalFunnel.Depth].collect()
    // transitions are monotone per user → last == max
    val perUser = rows.groupBy(_.user_id).view.mapValues(_.map(_.depth).max)
    val emitted = perUser.values.groupBy(d => d.toLong)
      .view.mapValues(_.size.toLong).toMap
    val allUsers = evs.map(_.user_id).distinct.length
    emitted + (0L -> (allUsers - perUser.size).toLong)
  }

  private def batchHist: Map[Long, Long] = {
    val m = graft.SparkEntry.queries("q_funnel_window")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // the batch query emits no depth-0 row when every user has a view
    m + (0L -> m.getOrElse(0L, 0L))
  }

  test("streamed depths == batch q_funnel_window across 4 batches") {
    assert(streamed(nBatches = 4) === batchHist)
  }

  test("single batch also matches (no boundary hand-off)") {
    assert(streamed(nBatches = 1) === batchHist)
  }

  test("a completed funnel never re-emits; same-µs step ties match batch") {
    import IncrementalFunnel.{Depth, FEv}
    val ms = MemoryStream[FEv](spark)
    val name = s"funnel_term_${System.nanoTime()}"
    val q = IncrementalFunnel.depths(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user 1 completes the funnel; user 2's click shares its view's
      // exact µs with a LOWER event id — batch `ts >= t1` admits it,
      // so the type-phase tiebreak must anchor the view first
      ms.addData(Seq(
        FEv(1, 10, 0, "view"), FEv(1, 20, 1, "click"),
        FEv(1, 30, 2, "purchase"),
        FEv(2, 10, 3, "click"), FEv(2, 10, 5, "view")))
      q.processAllAvailable()
      // a later view+click for the COMPLETED user must emit nothing —
      // not a fresh depth-1/2 (the retained depth-3 record blocks it)
      ms.addData(Seq(FEv(1, 40, 6, "view"), FEv(1, 50, 7, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[Depth].collect().toSeq
    assert(rows.filter(_.user_id == 1).map(_.depth).sorted == Seq(1, 2, 3),
      rows)
    assert(rows.filter(_.user_id == 2).map(_.depth).sorted == Seq(1, 2), rows)
  }

  test("eviction bounds state; evicted users restart cold") {
    import IncrementalFunnel.{Depth, FEv}
    val hour = 3600L * 1000000
    // user 1: view then idle past TTL, reappears with a view+click;
    // user 2: heartbeat views advance the watermark. The timeout only
    // FIRES in a trigger where the key is silent, so the eviction
    // needs its own batch (3) between the watermark jump (2) and the
    // reappearance (4). T0 is far from epoch: a first event AT the
    // initial zero watermark is dropped by the late-row filter.
    val T0 = 1000 * hour
    val evs = Seq(
      Seq(FEv(1, T0, 0, "view"), FEv(2, T0, 1, "view")),
      Seq(FEv(2, T0 + 200 * hour, 2, "view")), // watermark → T0+199h
      Seq(FEv(2, T0 + 203 * hour, 3, "view")), // user 1 silent → evicted
      Seq(FEv(1, T0 + 210 * hour, 4, "view"),
        FEv(1, T0 + 211 * hour, 5, "click"),
        FEv(2, T0 + 212 * hour, 6, "view")))
    val ms = MemoryStream[FEv](spark)
    val name = s"funnel_evict_${System.nanoTime()}"
    val input = ms.toDS()
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("seq")))
      .withWatermark("ts", "1 hour")
      .as[FEv]
    val q = IncrementalFunnel.depths(input,
      evictAfterMs = Some(24L * 3600 * 1000))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table(name).as[Depth].collect().toSeq
    // user 1 re-anchored COLD at 210h: re-emits depth 1, then the
    // in-window click emits 2 (the fresh anchor admits it — under the
    // batch forever-first anchor at 0h the click would be out of window)
    assert(rows.count(r => r.user_id == 1 && r.depth == 1) == 2)
    assert(rows.contains(Depth(1, 2)))
    assert(rows.filter(_.user_id == 2).map(_.depth).toSet == Set(1))
  }
}
