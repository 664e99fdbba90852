package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streamed forward fill must equal the batch IGNORE NULLS window
  * row-for-row when batches respect event order. */
class IncrementalLocfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def obsStreamResult(nBatches: Int): Map[(Long, Long), Option[Double]] = {
    val obs = graft.table(spark, sfDir, "events")
      .select(col("user_id").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("seq"),
        col("event_id").as("sub"),
        when(col("value") < 10, lit(null)).otherwise(col("value")).as("v"))
      .as[IncrementalLocf.Obs]
      .collect().sortBy(o => (o.seq, o.sub))
    val ms = MemoryStream[IncrementalLocf.Obs](spark)
    val name = s"locf_${System.nanoTime()}"
    val q = IncrementalLocf.locf(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      obs.grouped(math.max(1, obs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[IncrementalLocf.Filled].collect()
      .map(f => (f.key, f.sub) -> f.filled).toMap
  }

  test("streamed locf == batch IGNORE NULLS fill across 3 batches") {
    val batch = graft.SparkEntry.queries("q_locf")(spark, sfDir)
      .collect().map { r =>
        val filled = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        (r.getLong(0), r.getLong(1)) -> filled
      }.toMap
    val stream = obsStreamResult(nBatches = 3)
    assert(stream.keySet === batch.keySet)
    batch.foreach { case (k, f) =>
      assert(stream(k) === f, s"key $k")
    }
    assert(batch.values.exists(_.isDefined) && batch.values.exists(_.isEmpty),
      "corpus must exercise both filled and leading-null rows")
  }
}
