package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Independent plain-Scala derivation for q_attribution: an explicit
  * per-user fold in (ts, event_id) order carrying the last non-purchase
  * touch, plus the conservation law (credited purchases sum to the
  * purchase count). */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("q_attribution == per-user carry fold; credit conserves") {
    val events = graft.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as us",
        "event_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
    val credited = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      var touch: String = null
      evs.sortBy(e => (e._2, e._3)).flatMap { case (_, _, _, tpe, v) =>
        val out = if (tpe == "purchase")
          Some((if (touch == null) "(none)" else touch, v)) else None
        if (tpe != "purchase") touch = tpe
        out
      }
    }
    val expect = credited.groupBy(_._1).map { case (t, vs) =>
      (t, vs.size.toLong,
        vs.map(v => BigDecimal(v._2).setScale(10,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }.toSet
    val got = graft.SparkEntry.queries("q_attribution")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    assert(got == expect)
    assert(got.toSeq.map(_._2).sum == events.count(_._4 == "purchase"))
    assert(got.nonEmpty)
  }
}
