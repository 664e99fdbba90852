package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The merge-sweep as-of join is oracle-checked on numeric keys via
  * q_asof_merge; this spec covers the generic-key contract: native key
  * types survive the sweep (no silent numeric cast) and mismatched key
  * types fail fast instead of returning cross-key garbage.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quotes = Seq(
    ("aapl", 1L, 10.0), ("aapl", 5L, 11.0), ("msft", 2L, 20.0))
    .toDF("sym", "qt", "px")
  private def trades = Seq(
    ("aapl", 1L, 100L), ("aapl", 4L, 101L), ("aapl", 6L, 102L),
    ("msft", 1L, 200L), ("msft", 3L, 201L))
    .toDF("tsym", "tt", "trade_id")

  test("string keys join as-of without numeric coercion") {
    val got = AsOfJoin.merged(trades, "tsym", "tt", quotes, "sym", "qt", "qt")
      .select("trade_id", "px").as[(Long, Double)].collect().toMap
    // msft@1 has no quote ≤ 1 → dropped (inner as-of semantics)
    assert(got == Map(100L -> 10.0, 101L -> 10.0, 102L -> 11.0, 201L -> 20.0))
  }

  test("merge-sweep equals the window formulation on string keys") {
    val viaW = AsOfJoin.viaWindow(trades, "tsym", "tt", quotes, "sym", "qt", "qt")
      .select("trade_id", "px").as[(Long, Double)].collect().toSet
    val viaM = AsOfJoin.merged(trades, "tsym", "tt", quotes, "sym", "qt", "qt")
      .select("trade_id", "px").as[(Long, Double)].collect().toSet
    assert(viaM == viaW)
  }

  test("mismatched key types fail fast") {
    val badRight = quotes.selectExpr("CAST(1 AS BIGINT) AS sym", "qt", "px")
    intercept[IllegalArgumentException] {
      AsOfJoin.merged(trades, "tsym", "tt", badRight, "sym", "qt", "qt")
    }
  }
}
