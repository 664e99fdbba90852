package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class EnEv(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

/** Stream–static enrichment must equal the batch join row-for-row —
  * every micro-batch sees the dim, unmatched stream rows drop, and no
  * state accumulates (the join is stateless, so batch splits cannot
  * change the result). */
class EnrichStaticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def dim = graft.table(spark, sfDir, "customer")
    .selectExpr("c_custkey", "c_mktsegment")

  test("streamed enrichment == batch join across 3 micro-batches") {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("event_id", "cast(ts as timestamp) as ts", "user_id",
        "value")
      .as[EnEv].collect().sortBy(_.event_id)
    val ms = MemoryStream[EnEv](spark)
    val name = s"en_${System.nanoTime()}"
    val q = StreamingOps.enrichStatic(ms.toDF(), dim, "user_id", "c_custkey")
      .selectExpr("event_id", "c_mktsegment")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).as[(Long, String)].collect().toSet

    val expect = graft.table(spark, sfDir, "events")
      .join(dim, $"user_id" === $"c_custkey")
      .selectExpr("event_id", "c_mktsegment")
      .as[(Long, String)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // inner semantics: nothing fabricated for unmatched users
    val dimKeys = dim.select("c_custkey").as[Long].collect().toSet
    val matchedEvents = evs.filter(e => dimKeys.contains(e.user_id)).map(_.event_id).toSet
    assert(got.map(_._1) == matchedEvents)
  }
}
