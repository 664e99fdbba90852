package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in event-time state eviction for the stateful twins: state
  * stays bounded under a churning key stream (the 100 TB concern: keys
  * = users grow forever under NoTimeout), active keys are emitted
  * identically, and an evicted key that reappears restarts COLD — the
  * documented contract. */
class StateEvictionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = 1_000_000_000_000_000L // µs epoch base
  private val HourUs = 3_600_000_000L
  private val TtlMs = 3_600_000L // evict one hour past a key's last event

  private def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators).lastOption
      .map(_.numRowsTotal).getOrElse(-1L)

  test("attribution: churned keys evict (bounded state), active keys credit " +
      "identically, evicted keys restart cold") {
    val ms = MemoryStream[IncrementalAttribution.AEv](spark)
    val evs = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalAttribution.AEv]
    val name = s"attr_evict_${System.nanoTime()}"
    val q = IncrementalAttribution.credits(evs, evictAfterMs = Some(TtlMs))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    import IncrementalAttribution.AEv
    try {
      // batch 1: 50 churning users + user 999 each leave one click
      ms.addData((1L to 50L).map(u => AEv(u, T0, u, "click", 0.0)) :+
        AEv(999L, T0, 999L, "click", 0.0))
      q.processAllAvailable()
      // batch 2 (2h later): user 5000 clicks — advances the watermark
      // past every batch-1 timeout (T0 + 1h)
      ms.addData(Seq(AEv(5000L, T0 + 2 * HourUs, 1L, "click", 0.0)))
      q.processAllAvailable()
      // batch 3: user 5001 arrives; the watermark is now T0+2h, so the
      // 51 batch-1 states time out and evict IN this batch. User 5000
      // (active, within TTL of the watermark) purchases → credited.
      ms.addData(Seq(AEv(5001L, T0 + 2 * HourUs + 1_000_000L, 1L, "view", 0.0),
        AEv(5000L, T0 + 2 * HourUs + 1_000_000L, 2L, "purchase", 10.0)))
      q.processAllAvailable()
      val rowsAfterEvict = lastStateRows(q)
      assert(rowsAfterEvict >= 0 && rowsAfterEvict <= 2,
        s"batch-1 states not evicted: $rowsAfterEvict state rows")
      // batch 4: evicted user 999 reappears with a purchase — their
      // pre-eviction click is forgotten: credited "(none)" (cold)
      ms.addData(Seq(AEv(999L, T0 + 2 * HourUs + 2_000_000L, 1L, "purchase", 7.0)))
      q.processAllAvailable()
    } finally q.stop()

    val credits = spark.table(name).as[IncrementalAttribution.Credit]
      .collect().toSet
    assert(credits.contains(IncrementalAttribution.Credit(5000L, "click", 10.0)),
      s"active key must credit exactly as under NoTimeout: $credits")
    assert(credits.contains(IncrementalAttribution.Credit(999L, "(none)", 7.0)),
      s"evicted key must restart cold: $credits")
    assert(credits.size == 2, s"unexpected extra credits: $credits")
  }

  test("watermark skew: a 3-day watermark jump against a near-past key " +
      "neither crashes the query nor duplicates its session") {
    // one key's far-future event advances the eviction watermark 3
    // days while another key's session sits 3 days back. Under
    // production triggers the late-row filter can lag the eviction
    // watermark by a batch (SPARK-40925), letting the function see a
    // row whose last+TTL is BELOW the watermark — raw
    // setTimeoutTimestamp throws there and kills the query
    // (re-crashing from checkpoint); EvictionClock clamps to
    // watermark+1. Under processAllAvailable the engine instead drops
    // the skewed row as late — EITHER way the contract this test pins
    // must hold: the query completes and the stale key's session is
    // emitted exactly once, closed by timeout.
    val ms = MemoryStream[IncrementalSessionize.SEv](spark)
    val input = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalSessionize.SEv]
    val name = s"sess_skew_${System.nanoTime()}"
    val q = IncrementalSessionize.sessions(input)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    import IncrementalSessionize.SEv
    try {
      ms.addData(Seq(SEv(1L, T0, 0L, 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(SEv(9000L, T0 + 72 * HourUs, 0L, 0.0)))
      q.processAllAvailable()
      // the crash batch pre-fix: user 1's merge sets a timeout at
      // T0+1min+30min << watermark (T0+3d)
      ms.addData(Seq(SEv(1L, T0 + 60_000_000L, 1L, 2.0)))
      q.processAllAvailable()
      // two more sentinels so the clamped timeout fires
      ms.addData(Seq(SEv(9001L, T0 + 73 * HourUs, 0L, 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(SEv(9002L, T0 + 74 * HourUs, 0L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).as[IncrementalSessionize.Session]
      .collect().filter(_.user_id == 1L).toSeq
    // exactly ONE closed session for the stale key, anchored at T0 —
    // whether the skewed row was admitted (clamped timeout, 2 events)
    // or dropped as late by the engine (1 event), and never a crash
    // or a duplicate emission
    assert(got.size == 1 && got.head.start_us == T0 &&
      (got.head.n_events == 1L || got.head.n_events == 2L), got)
  }

  test("ewma: eviction re-emits the final row then restarts the fold cold") {
    val ms = MemoryStream[IncrementalEwma.Ev](spark)
    val evs = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalEwma.Ev]
    val name = s"ewma_evict_${System.nanoTime()}"
    val q = IncrementalEwma.ewma(evs, evictAfterMs = Some(TtlMs))
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    import IncrementalEwma.Ev
    try {
      ms.addData(Seq(Ev(1L, T0, 0L, 10.0), Ev(1L, T0, 1L, 20.0)))
      q.processAllAvailable()
      ms.addData(Seq(Ev(2L, T0 + 2 * HourUs, 0L, 5.0))) // advance watermark
      q.processAllAvailable()
      ms.addData(Seq(Ev(3L, T0 + 2 * HourUs + 1_000_000L, 0L, 1.0))) // fire timeout
      q.processAllAvailable()
      assert(lastStateRows(q) <= 2, s"key 1 not evicted: ${lastStateRows(q)}")
      ms.addData(Seq(Ev(1L, T0 + 2 * HourUs + 2_000_000L, 0L, 40.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).as[IncrementalEwma.EwmaRow].collect()
      .filter(_.user_id == 1L)
    // pre-eviction fold: 0.3·10, then 0.3·20 + 0.7·3 = 8.1 — emitted
    // once with data and once more by the timeout invocation
    assert(rows.count(r => r.n_events == 2L) == 2, rows.mkString(","))
    // cold restart: n back at 1, fold re-seeded from zero
    assert(rows.exists(r => r.n_events == 1L && math.abs(r.ewma - 12.0) < 1e-9),
      s"reappearing key must restart cold: ${rows.mkString(",")}")
  }

  test("transitions: eviction breaks the cross-batch pairing for idle keys only") {
    val ms = MemoryStream[IncrementalTransitions.TEv](spark)
    val evs = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalTransitions.TEv]
    val name = s"trans_evict_${System.nanoTime()}"
    val q = IncrementalTransitions.transitions(evs, evictAfterMs = Some(TtlMs))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    import IncrementalTransitions.TEv
    try {
      ms.addData(Seq(TEv(999L, T0, 0L, "click")))
      q.processAllAvailable()
      // active user 5000 carries a type across batches within the TTL
      ms.addData(Seq(TEv(5000L, T0 + 2 * HourUs, 0L, "view")))
      q.processAllAvailable()
      // timeouts fire here (999 evicts); 5000 pairs across the boundary
      ms.addData(Seq(TEv(5000L, T0 + 2 * HourUs + 1_000_000L, 1L, "purchase")))
      q.processAllAvailable()
      // evicted 999 reappears: no (click -> view) pair may be emitted
      ms.addData(Seq(TEv(999L, T0 + 2 * HourUs + 2_000_000L, 0L, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).as[IncrementalTransitions.Transition]
      .collect().toSet
    assert(got == Set(
      IncrementalTransitions.Transition(5000L, "view", "purchase")), got)
  }

  test("locf: evicted key refills cold; active key fills across batches") {
    val ms = MemoryStream[IncrementalLocf.Obs](spark)
    val obs = ms.toDS()
      .withColumn("ts", timestamp_micros(col("seq")))
      .withWatermark("ts", "0 seconds")
      .as[IncrementalLocf.Obs]
    val name = s"locf_evict_${System.nanoTime()}"
    val q = IncrementalLocf.locf(obs, evictAfterMs = Some(TtlMs))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    import IncrementalLocf.Obs
    try {
      // key 1 observes 5.0; churn keys 10..40 observe too
      ms.addData(Obs(1L, T0, 0L, Some(5.0)) +:
        (10L to 40L).map(k => Obs(k, T0, 0L, Some(k.toDouble))))
      q.processAllAvailable()
      // advance the watermark 2h; key 2 carries 9.0
      ms.addData(Seq(Obs(2L, T0 + 2 * HourUs, 0L, Some(9.0))))
      q.processAllAvailable()
      // timeouts fire here (key 3 carries data); key 2 is active and
      // its gap still fills from the carried 9.0
      ms.addData(Seq(Obs(3L, T0 + 2 * HourUs + 1_000_000L, 0L, Some(1.0)),
        Obs(2L, T0 + 2 * HourUs + 1_000_000L, 1L, None)))
      q.processAllAvailable()
      assert(lastStateRows(q) <= 3, s"states not evicted: ${lastStateRows(q)}")
      // key 1 reappears with a gap — evicted, so the fill is COLD None
      ms.addData(Seq(Obs(1L, T0 + 2 * HourUs + 2_000_000L, 0L, None)))
      q.processAllAvailable()
    } finally q.stop()

    val filled = spark.table(name).as[IncrementalLocf.Filled].collect()
    val key2Gap = filled.find(f => f.key == 2L && f.sub == 1L).get
    assert(key2Gap.filled.contains(9.0),
      s"active key must fill across batches: $key2Gap")
    val key1Cold = filled.find(f => f.key == 1L && f.seq > T0).get
    assert(key1Cold.filled.isEmpty,
      s"evicted key must restart cold (no fill): $key1Cold")
  }
}
