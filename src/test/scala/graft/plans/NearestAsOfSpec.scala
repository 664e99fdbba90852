package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Tie semantics for the bidirectional nearest as-of: equidistant
  * rights resolve to the EARLIER one, a right at the exact left
  * timestamp yields gap 0, keys with no rights emit null, and random
  * streams (with deliberate timestamp collisions) match a quadratic
  * nearest scan. */
class NearestAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // (event_id, user_id, event_type, us)
  private def run(rows: Seq[(Long, Long, String, Long)])
      : Map[Long, Option[(Long, Long)]] = {
    import spark.implicits._
    val df = rows.toDF("event_id", "user_id", "event_type", "us")
    NearestAsOf.nearest(df, "purchase", "click").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(3)) None
                       else Some((r.getLong(3), r.getLong(4))))
    }.toMap
  }

  private def brute(rows: Seq[(Long, Long, String, Long)])
      : Map[Long, Option[(Long, Long)]] =
    rows.filter(_._3 == "purchase").map { p =>
      val clicks = rows.filter(r => r._2 == p._2 && r._3 == "click")
      p._1 -> (if (clicks.isEmpty) None
               else {
                 val best = clicks.map(_._4)
                   .minBy(cu => (math.abs(cu - p._4), cu))
                 Some((best, math.abs(best - p._4)))
               })
    }.toMap

  test("equidistant clicks resolve to the earlier one") {
    val rows = Seq(
      (1L, 1L, "click", 100L), (2L, 1L, "purchase", 150L),
      (3L, 1L, "click", 200L))
    assert(run(rows)(2L) === Some((100L, 50L)))
  }

  test("click at the exact purchase timestamp gives gap zero") {
    for (clickId <- Seq(1L, 9L)) { // click sorts before AND after the purchase
      val rows = Seq(
        (clickId, 1L, "click", 500L), (5L, 1L, "purchase", 500L))
      assert(run(rows)(5L) === Some((500L, 0L)))
    }
  }

  test("user with no clicks emits null; other users unaffected") {
    val rows = Seq(
      (1L, 1L, "purchase", 10L),
      (2L, 2L, "click", 10L), (3L, 2L, "purchase", 12L))
    val got = run(rows)
    assert(got(1L) === None)
    assert(got(3L) === Some((10L, 2L)))
  }

  test("random collision-heavy streams match a quadratic nearest scan") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(120)
      // timestamps from a small pool → frequent exact collisions
      val rows = (0 until n).map { i =>
        (i.toLong, (rnd.nextInt(4) + 1).toLong,
          if (rnd.nextBoolean()) "click" else "purchase",
          rnd.nextInt(20).toLong * 10L)
      }
      assert(run(rows) === brute(rows), s"seed=$seed")
    }
  }
}
