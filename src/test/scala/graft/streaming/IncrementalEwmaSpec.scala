package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed EWMA fold must equal the batch fold EXACTLY (bit-equal
  * doubles) when batches respect event order — the fold order is the
  * same, so the IEEE arithmetic is the same. */
class IncrementalEwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(nBatches: Int): Map[Long, (Long, Double)] = {
    val evs = IncrementalEwma
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalEwma.Ev](spark)
    val name = s"ewma_${System.nanoTime()}"
    val q = IncrementalEwma.ewma(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // time-ordered slices: cross-batch order is the source contract
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalEwma.EwmaRow].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        val last = rows.maxBy(_.n_events) // update mode: keep latest
        u -> (last.n_events, last.ewma)
      }
  }

  test("streamed ewma == batch q_ewma, bit-exact, across 3 batches") {
    val batch = graft.SparkEntry.queries("q_ewma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val stream = streamed(nBatches = 3)
    assert(stream.keySet === batch.keySet)
    batch.foreach { case (u, (n, e)) =>
      val (sn, se) = stream(u)
      assert(sn === n, s"user $u count")
      assert(se === e, s"user $u: streamed $se != batch $e")
    }
  }

  test("single-batch streamed ewma also matches (degenerate case)") {
    val batch = graft.SparkEntry.queries("q_ewma")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val stream = streamed(nBatches = 1)
    batch.foreach { case (u, e) => assert(stream(u)._2 === e) }
  }
}
