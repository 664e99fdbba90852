package graft.cdc

import graft.TestSpark
import graft.cdc.IncrementalView.ViewDef
import graft.cdc.IncrementalJoinView.JoinViewDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Grid percentiles over a LIVE JOIN VIEW (round-13 verdict #8): the
  * p90-order-value-per-customer-segment read. The histogram is a
  * count-only join view grouped by (segment, bucket) — segment rides
  * the customers base, the bucket column rides orders (bucketed
  * upstream) — so IncrementalJoinView's whole delta-join contract
  * carries it; GridPercentile.readJoin adds only the ceil-threshold
  * read. The invariant under churn: the live read equals
  * GridPercentile.percentiles over a RECOMPUTE of the current joined
  * snapshot, bit-for-bit, after every refresh. */
class GridPercentileJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Width = 10L
  private val Pcts = Seq(50L, 90L, 99L)

  // ord(oid, ck, bucket) ⋈ cust(custkey, segment) ON ck = custkey;
  // bucket = floor(order value / Width), computed upstream of the base
  private val jdef = JoinViewDef(
    left = "ord", leftPks = Seq("oid"),
    right = "cust", rightPks = Seq("custkey"),
    leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
    view = "seg_hist",
    vdef = ViewDef(Seq("segment", "bucket"), Nil))

  private def freshStore() = new ParquetTableStore(spark,
    "file:" + Files.createTempDirectory("graft-gpjoin"), nBuckets = 8)

  private def orders(t: (Int, Int, Long)*): DataFrame =
    t.toDF("oid", "ck", "bucket")
  private def custs(t: (Int, String)*): DataFrame =
    t.toDF("custkey", "segment")
  private def oKeys(ids: Int*): DataFrame = ids.toDF("oid")
  private def cKeys(ids: Int*): DataFrame = ids.toDF("custkey")

  private def collectPct(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select("segment", "p", "edge", "n")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet

  private def assertReadExact(store: ParquetTableStore): Unit = {
    val got = GridPercentile.readJoin(store, jdef, Pcts, Width)
    val joined = store.read("ord").get.join(
      store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
    if (joined.isEmpty) {
      assert(got.forall(_.isEmpty), "read nonempty on an empty join")
    } else {
      val expected = GridPercentile.percentiles(
        IncrementalView.compute(joined, jdef.vdef),
        Seq("segment"), "bucket", Pcts, Width)
      assert(collectPct(got.get) == collectPct(expected),
        s"percentile join view drifted")
    }
  }

  test("p90 order value per customer segment reads off the join view " +
      "and matches a recompute; edges move with churn") {
    val store = freshStore()
    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 3L), (2, 10, 7L), (3, 10, 9L), (4, 20, 1L)), oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "gold"), (20, "basic")), cKeys())
    IncrementalJoinView.initialize(store, jdef)
    assertReadExact(store)
    val p90 = collectPct(GridPercentile.readJoin(store, jdef, Pcts, Width).get)
    // gold has buckets {3,7,9}: p50 → ceil(1.5)=2nd (7), p90 → 3rd (9)
    assert(p90.contains(("gold", 50L, 70L, 3L)), p90)
    assert(p90.contains(("gold", 90L, 90L, 3L)), p90)

    // churn: the p90-carrying order is DELETED — the edge must drop
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(3))
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertReadExact(store)
    val afterDel = collectPct(
      GridPercentile.readJoin(store, jdef, Pcts, Width).get)
    assert(afterDel.contains(("gold", 90L, 70L, 2L)), afterDel)

    // segment move: customer 10 relocates gold→basic — its whole
    // histogram mass must relocate with it
    store.applyChanges("cust", Seq("custkey"), custs((10, "basic")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertReadExact(store)
    val moved = collectPct(
      GridPercentile.readJoin(store, jdef, Pcts, Width).get)
    assert(!moved.exists(_._1 == "gold"), moved)
  }

  test("25 rounds of seeded churn on BOTH sides stay recompute-exact " +
      "(inserts/updates/deletes, join-key churn, segment moves, " +
      "dangling keys)") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260816L)
    val segments = Array("gold", "silver", "basic")
    var nextOid = 1
    def someCk() = rnd.nextInt(7) + 1
    def someBucket() = rnd.nextInt(12).toLong
    def insOrders(k: Int): Seq[(Int, Int, Long)] = (1 to k).map { _ =>
      val oid = nextOid; nextOid += 1
      (oid, someCk(), someBucket())
    }
    var live = Set.empty[Int]
    val o0 = insOrders(15); live ++= o0.map(_._1)
    store.applyChanges("ord", Seq("oid"), orders(o0: _*), oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((1 to 4).map(ck => (ck, segments(rnd.nextInt(3)))): _*), cKeys())
    IncrementalJoinView.initialize(store, jdef)
    assertReadExact(store)

    (1 to 25).foreach { round =>
      if (round % 3 != 0) { // LEFT churn (skip a phase for one-leg spans)
        val ins = insOrders(rnd.nextInt(4))
        live ++= ins.map(_._1)
        // updates move orders between customers AND buckets
        val upd = live.toSeq.sorted.take(rnd.nextInt(3))
          .map(oid => (oid, someCk(), someBucket()))
        val del = live.toSeq.sorted.drop(2).take(rnd.nextInt(2))
        live --= del
        store.applyChanges("ord", Seq("oid"),
          orders(ins ++ upd: _*), oKeys(del: _*))
      }
      if (round % 4 != 0) { // RIGHT churn: segment moves, death, birth
        val moves = (1 to rnd.nextInt(2)).map { _ =>
          (rnd.nextInt(9) + 1, segments(rnd.nextInt(3)))
        }
        val dead = if (rnd.nextInt(4) == 0) Seq(rnd.nextInt(9) + 1) else Nil
        store.applyChanges("cust", Seq("custkey"),
          custs(moves: _*), cKeys(dead: _*))
      }
      IncrementalJoinView.refreshToCurrent(store, jdef)
      assertReadExact(store)
    }
  }
}
