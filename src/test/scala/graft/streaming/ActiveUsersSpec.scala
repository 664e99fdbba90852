package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class AuEv(user_id: Long, ts: Timestamp)

/** The streamed sliding distinct-user counts must equal the batch
  * DAU/WAU query per window: a 7-day window ending on day d (start
  * d−6) carries exactly batch q_rolling_active_users' wau(d) — for
  * every day present in the corpus, across micro-batch splits (the
  * dedup state hands user/window pairs across batches). */
class ActiveUsersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def streamed(nBatches: Int): Map[String, Long] = {
    val evs = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "cast(ts as timestamp) as ts")
      .as[AuEv].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[AuEv](spark)
    val name = s"au_${System.nanoTime()}"
    val q = StreamingOps.activeUsers(ms.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      evs.grouped(math.max(1, evs.length / nBatches + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    // key windows by their END day minus 1 (the batch day the window
    // represents): [s, s+7) ⇒ day = last covered day = s+6
    spark.table(name)
      .selectExpr("cast(date_add(cast(ws as date), 6) as string) as day",
        "wau")
      .as[(String, Long)].collect().toMap
  }

  private lazy val batch: Map[String, Long] =
    graft.SparkEntry.queries("q_rolling_active_users")(spark, sfDir)
      .selectExpr("cast(day as string)", "wau")
      .as[(String, Long)].collect().toMap

  test("streamed 7-day distinct users == batch WAU per present day, 4 batches") {
    val got = streamed(nBatches = 4)
    batch.foreach { case (day, wau) =>
      assert(got.get(day).contains(wau), s"day $day: got ${got.get(day)}, want $wau")
    }
    assert(batch.nonEmpty)
  }

  test("single batch also matches") {
    val got = streamed(nBatches = 1)
    batch.foreach { case (day, wau) =>
      assert(got.get(day).contains(wau), s"day $day")
    }
  }
}
