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

  test("q_rfm_segments == explicit NTILE(5) scorer over plain-Scala RFM") {
    val orders = graft.table(spark, sfDir, "orders")
      .selectExpr("o_custkey", "cast(cast(o_orderdate as date) as string)",
        "cast(o_totalprice as decimal(38,10))")
      .as[(Long, String, BigDecimal)].collect()
    val mx = orders.map(_._2).max
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    def days(a: String, b: String) = java.time.temporal.ChronoUnit.DAYS
      .between(java.time.LocalDate.parse(a, fmt), java.time.LocalDate.parse(b, fmt))
    val rfm = orders.groupBy(_._1).map { case (ck, os) =>
      (ck, days(os.map(_._2).max, mx), os.size.toLong,
        os.map(_._3).sum.setScale(10))
    }.toSeq
    def ntile(xs: Seq[(Long, Double)]): Map[Long, Long] = {
      // xs: (custkey, sort value); ties broken by custkey
      val n = xs.length; val q = n / 5; val r = n % 5
      xs.sortBy { case (ck, v) => (v, ck) }.zipWithIndex.map { case ((ck, _), i) =>
        val rk = i + 1
        val tile = if (rk <= r * (q + 1)) (rk - 1) / (q + 1) + 1
                   else r + 1 + (rk - r * (q + 1) - 1) / math.max(q, 1)
        ck -> tile.toLong
      }.toMap
    }
    val rs = ntile(rfm.map(x => (x._1, x._2.toDouble)))
    val fs = ntile(rfm.map(x => (x._1, -x._3.toDouble)))
    val ms = ntile(rfm.map(x => (x._1, -x._4.toDouble)))
    val expect = rfm.groupBy(x => (rs(x._1), fs(x._1), ms(x._1)))
      .map { case (k, xs) =>
        (k._1, k._2, k._3, xs.size.toLong, xs.map(_._4).sum.toDouble)
      }.toSet
    val got = graft.SparkEntry.queries("q_rfm_segments")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expect)
    // quintile populations are near-equal per dimension
    for (scores <- Seq(rs, fs, ms)) {
      val sizes = scores.values.groupBy(identity).map(_._2.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("q_dow_seasonality == plain-Scala ISO-weekday rollup") {
    val orders = graft.table(spark, sfDir, "orders")
      .selectExpr("cast(cast(o_orderdate as date) as string)",
        "cast(o_totalprice as decimal(38,10))")
      .as[(String, BigDecimal)].collect()
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    val tot = orders.map(_._2).sum.toDouble
    val expect = orders.groupBy { case (d, _) =>
      java.time.LocalDate.parse(d, fmt).getDayOfWeek.getValue.toLong
    }.map { case (dow, os) =>
      val rev = os.map(_._2).sum.toDouble
      (dow, os.size.toLong, rev,
        BigDecimal(rev / tot).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSet
    val got = graft.SparkEntry.queries("q_dow_seasonality")(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
    // shares sum to ~1 over ≤7 rows
    val shareSum = got.toSeq.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }
}
