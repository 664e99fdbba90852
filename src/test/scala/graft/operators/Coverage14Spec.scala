package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivations for the Coverage14 monitoring
  * operators: an explicit trailing-window fold for the daily anomaly
  * flags and a counter-map recount for the skew report. */
class Coverage14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  private def r(x: Double, s: Int) =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_daily_anomaly == explicit trailing 7-day fold") {
    val days = graft.table(spark, sfDir, "events")
      .selectExpr("cast(cast(ts as date) as string) as day")
      .as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val expect = days.indices.flatMap { i =>
      val (day, n) = days(i)
      val win = days.slice(math.max(0, i - 7), i).map(_._2)
      if (win.length < 3) None
      else {
        val wn = win.length
        val m = win.sum.toDouble / wn
        val sd = math.sqrt((win.map(x => x * x).sum.toDouble - wn * m * m) /
          (wn - 1).toDouble)
        val z = (n.toDouble - m) / sd
        if (sd > 0 && math.abs(z) >= 1.5) Some((day, n, r(m, 6), r(z, 4)))
        else None
      }
    }.toSet
    val got = graft.SparkEntry.queries("q_daily_anomaly")(spark, sfDir)
      .selectExpr("cast(day as string)", "n", "trailing_mean", "z")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("q_skew_report == counter-map recount per key column") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val oc = graft.table(spark, sfDir, "orders")
      .select("o_custkey").as[Long].collect()
    val eu = graft.table(spark, sfDir, "events")
      .select("user_id").as[Long].collect()
    def leg(name: String, ks: Seq[Long]) = {
      val counts = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (name, ks.size.toLong, counts.size.toLong,
        r(ks.size.toDouble / counts.size, 6),
        r(counts.values.max.toDouble / ks.size, 6))
    }
    val expect = Set(
      leg("lineitem.l_partkey", li.map(_._1)),
      leg("lineitem.l_suppkey", li.map(_._2)),
      leg("orders.o_custkey", oc.toSeq),
      leg("events.user_id", eu.toSeq))
    val got = graft.SparkEntry.queries("q_skew_report")(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
    // shares are well-formed: the hottest key holds between 1/n_keys
    // and 100% of rows
    assert(got.forall { case (_, rows, keys, _, share) =>
      share * rows >= rows.toDouble / keys && share <= 1.0 })
  }
}
