package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed as-of-T snapshot must equal batch q_state_at exactly —
  * with the full stream (including events PAST T) delivered, across
  * micro-batch boundaries, and regardless of delivery order
  * (last-writer-wins is a max, so the operator declares no ordering
  * contract; the shuffled test pins that claim).
  */
class IncrementalStateAtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  // same instant as q_state_at's literal, UTC
  private val tMicros = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
    .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

  private def streamed(nBatches: Int,
                       order: Array[IncrementalStateAt.SEv] => Array[IncrementalStateAt.SEv])
      : Map[Long, (Long, String, Double)] = {
    val evs = order(IncrementalStateAt
      .fromEvents(graft.table(spark, sfDir, "events")).collect())
    val ms = MemoryStream[IncrementalStateAt.SEv](spark)
    val name = s"stateat_${System.nanoTime()}"
    val q = IncrementalStateAt.stateAt(ms.toDS(), tMicros)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // snapshot = max-(seq, event_id) emission per key
    spark.table(name).as[IncrementalStateAt.StateRow].collect()
      .groupBy(_.user_id).view.mapValues { rows =>
        val w = rows.maxBy(r => (r.seq, r.event_id))
        (w.event_id, w.event_type, w.value)
      }.toMap
  }

  private lazy val batchState: Map[Long, (Long, String, Double)] =
    graft.SparkEntry.queries("q_state_at")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getDouble(3)))).toMap

  test("streamed snapshot == batch q_state_at across 4 batches (in-order)") {
    assert(streamed(4, _.sortBy(e => (e.seq, e.sub))) === batchState)
  }

  test("out-of-order delivery converges to the same snapshot") {
    // deterministic shuffle: md5-keyed order, events past T interleaved
    def md5(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(streamed(5, _.sortBy(e => md5(s"${e.sub}"))) === batchState)
  }

  test("re-delivery (at-least-once) is idempotent") {
    val got = streamed(3, evs => evs ++ evs.take(evs.length / 2))
    assert(got === batchState)
  }
}
