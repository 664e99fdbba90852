package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed transition multiset must equal the batch lead()
  * pairing exactly — including transitions straddling micro-batch
  * boundaries (the state-store hand-off), each emitted exactly once. */
class IncrementalTransitionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(nBatches: Int): Map[(String, String), Long] = {
    val evs = IncrementalTransitions
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalTransitions.TEv](spark)
    val name = s"trans_${System.nanoTime()}"
    val q = IncrementalTransitions.transitions(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalTransitions.Transition].collect()
      .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.length.toLong)
      .toMap
  }

  private def batchCounts: Map[(String, String), Long] =
    graft.SparkEntry.queries("q_event_transitions")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

  test("streamed transitions == batch lead() pairing across 4 batches") {
    assert(streamed(nBatches = 4) === batchCounts)
  }

  test("single batch also matches (no boundary hand-off)") {
    assert(streamed(nBatches = 1) === batchCounts)
  }
}
