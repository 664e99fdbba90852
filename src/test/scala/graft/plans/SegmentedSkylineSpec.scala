package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Date

/** Adversarial correctness for the two-phase segmented skyline: heavy
  * price ties (equal prices MUST share a bucket and a reduction row),
  * tiny bucket counts (boundary hand-off between phase 1 and phase 2),
  * and the degenerate all-one-price path (hi == lo). Each dataset is
  * checked against a quadratic brute-force dominance scan. */
class SegmentedSkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def brute(rows: Seq[(Long, Date, Double)]): Set[Long] =
    rows.filter { a =>
      !rows.exists(b =>
        b._3 >= a._3 && !b._2.before(a._2) &&
          (b._3 > a._3 || b._2.after(a._2)))
    }.map(_._1).toSet

  private def viaPlan(rows: Seq[(Long, Date, Double)], nB: Int): Set[Long] = {
    import spark.implicits._
    val df = rows.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    SegmentedSkyline.skyline(df, nB).collect().map(_.getLong(0)).toSet
  }

  test("random tie-heavy datasets match brute force at several bucket counts") {
    val dates = (0 until 7).map(d => Date.valueOf(f"1997-03-${d + 1}%02d"))
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(180)
      // prices from a 9-value pool → massive ties; dates from 7 values
      val rows = (0 until n).map { i =>
        (i.toLong, dates(rnd.nextInt(dates.length)),
          (rnd.nextInt(9) + 1) * 10.0)
      }
      val expected = brute(rows)
      for (nB <- Seq(1, 3, 32)) {
        assert(viaPlan(rows, nB) === expected, s"seed=$seed nB=$nB")
      }
    }
  }

  test("all rows at one price (hi == lo bucket degenerate)") {
    val rows = Seq(
      (1L, Date.valueOf("1997-01-01"), 50.0),
      (2L, Date.valueOf("1997-01-03"), 50.0),
      (3L, Date.valueOf("1997-01-02"), 50.0))
    // only the max-date row survives (others dominated via same price)
    assert(viaPlan(rows, 16) === brute(rows))
    assert(viaPlan(rows, 16) === Set(2L))
  }

  test("single row and strictly increasing staircase") {
    val one = Seq((7L, Date.valueOf("1997-01-01"), 10.0))
    assert(viaPlan(one, 8) === Set(7L))
    // staircase: price up, date down — every row is on the frontier
    val stairs = (0 until 20).map { i =>
      (i.toLong, Date.valueOf(f"1997-02-${20 - i}%02d"), 100.0 + i)
    }
    assert(viaPlan(stairs, 4) === stairs.map(_._1).toSet)
  }
}
