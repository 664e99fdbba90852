package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streamed credit aggregate must equal batch q_attribution
  * exactly — including carries straddling micro-batch boundaries (a
  * touch in batch n crediting a purchase in batch n+1), each purchase
  * credited exactly once. */
class IncrementalAttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def r10(x: Double) =
    BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)

  private def streamed(nBatches: Int): Map[String, (Long, Double)] = {
    val evs = IncrementalAttribution
      .fromEvents(graft.table(spark, sfDir, "events"))
      .collect().sortBy(e => (e.seq, e.sub))
    val ms = MemoryStream[IncrementalAttribution.AEv](spark)
    val name = s"attr_${System.nanoTime()}"
    val q = IncrementalAttribution.credits(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalAttribution.Credit].collect()
      .groupBy(_.touch).view.mapValues { cs =>
        (cs.length.toLong, cs.map(c => r10(c.value)).sum.toDouble)
      }.toMap
  }

  private def batchReport: Map[String, (Long, Double)] =
    graft.SparkEntry.queries("q_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("streamed credits == batch q_attribution across 4 batches") {
    assert(streamed(nBatches = 4) === batchReport)
  }

  test("single batch also matches (no boundary hand-off)") {
    assert(streamed(nBatches = 1) === batchReport)
  }
}
