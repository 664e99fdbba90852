package graft.cdc

import graft.TestSpark
import graft.cdc.IncrementalView.ViewDef
import graft.cdc.IncrementalJoinView.JoinViewDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** RIGHT and FULL outer join-view IVM — the symmetric NE families
  * (IncrementalJoinView's six-leg algebra). The invariant: after any
  * refresh chain the view equals a recompute of the CURRENT outer
  * joined snapshot, under churn driving match counts through zero on
  * BOTH sides — dangling orders gaining/losing their customer,
  * customers gaining/losing their last order, in the same span. Group
  * keys sit on the JOIN KEY (never null under any outer type: the
  * USING-join coalesce). */
class JoinViewFullOuterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore() = new ParquetTableStore(spark,
    "file:" + Files.createTempDirectory("graft-jfull"), nBuckets = 8)

  private def orders(t: (Int, Int, Double)*): DataFrame =
    t.toDF("oid", "ck", "amount")
  private def custs(t: (Int, String)*): DataFrame =
    t.toDF("custkey", "region")
  private def oKeys(ids: Int*): DataFrame = ids.toDF("oid")
  private def cKeys(ids: Int*): DataFrame = ids.toDF("custkey")

  private def jdef(view: String, joinType: String) = JoinViewDef(
    left = "cust", leftPks = Seq("custkey"),
    right = "ord", rightPks = Seq("oid"),
    leftKeys = Seq("custkey"), rightKeys = Seq("ck"),
    view = view,
    vdef = ViewDef(Seq("custkey"), Seq("amount"), distincts = Seq("oid")),
    joinType = joinType)

  private def assertExact(store: ParquetTableStore, j: JoinViewDef): Unit = {
    val l = store.read("cust") match {
      case Some(d) if d.columns.nonEmpty => d
      case _ => Seq.empty[(Int, String)].toDF("custkey", "region")
    }
    val r = store.read("ord") match {
      case Some(d) if d.columns.nonEmpty => d
      case _ => Seq.empty[(Int, Int, Double)].toDF("oid", "ck", "amount")
    }
    val joined = l.join(r.withColumnRenamed("ck", "custkey"),
      Seq("custkey"), j.joinType)
    val exp = joined.groupBy("custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("amount").cast("decimal(38,10)")).as("sum_amount"),
        countDistinct(col("oid")).as("nd_oid"))
    val got = IncrementalJoinView.read(store, j).get
      .select("custkey", "n", "sum_amount", "nd_oid")
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
      s"${j.joinType} view '${j.view}' drifted:\n" +
        s"got ${got.collect().toSeq.sortBy(_.getInt(0))}\n" +
        s"expected ${exp.collect().toSeq.sortBy(_.getInt(0))}")
  }

  test("full outer: dangling orders and orderless customers both " +
      "survive; zero crossings on BOTH sides in one span cancel exactly") {
    val store = freshStore()
    val j = jdef("fview", "full_outer")
    // cust 1 matched, cust 2 orderless (NE-left); orders at key 5
    // DANGLE (NE-right)
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "eu")), cKeys())
    store.applyChanges("ord", Seq("oid"),
      orders((10, 1, 5.0), (11, 5, 2.0), (12, 5, 3.0)), oKeys())
    IncrementalJoinView.initialize(store, j)
    assertExact(store, j)
    val k5 = IncrementalJoinView.read(store, j).get
      .filter(col("custkey") === 5).select("n", "nd_oid")
      .as[(Long, Long)].head()
    assert(k5 == ((2L, 2L)), k5) // two dangling orders, no cust row

    // the dangling key comes ALIVE (cust 5 appears: NE-right class
    // retracts, inner rows born) while cust 1 loses its only order
    // (inner retracts, NE-left born) — both transitions in one span
    store.applyChanges("cust", Seq("custkey"), custs((5, "ap")), cKeys())
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(10))
    IncrementalJoinView.refreshToCurrent(store, j)
    assertExact(store, j)

    // and back: cust 5 dies under its live orders (inner → NE-right),
    // cust 1 gains an order again (NE-left → inner)
    store.applyChanges("cust", Seq("custkey"), custs(), cKeys(5))
    store.applyChanges("ord", Seq("oid"), orders((13, 1, 7.0)), oKeys())
    IncrementalJoinView.refreshToCurrent(store, j)
    assertExact(store, j)

    // order moves between a live and a dead key (12: 5 -> 2): the
    // NE-right row at 5 retracts, an inner row at 2 is born
    store.applyChanges("ord", Seq("oid"), orders((12, 2, 3.0)), oKeys())
    IncrementalJoinView.refreshToCurrent(store, j)
    assertExact(store, j)
  }

  test("right outer: every order counts, customers only through their " +
      "matches; left churn drives the null-extended class both ways") {
    val store = freshStore()
    val j = jdef("rview", "right_outer")
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "eu")), cKeys())
    store.applyChanges("ord", Seq("oid"),
      orders((10, 1, 5.0), (11, 7, 2.0)), oKeys())
    IncrementalJoinView.initialize(store, j)
    assertExact(store, j)
    // orderless cust 2 contributes NOTHING under right outer
    assert(IncrementalJoinView.read(store, j).get
      .filter(col("custkey") === 2).isEmpty)

    // cust 7 appears (dangling order 11 joins in), cust 1 dies under
    // its order (10 relegated to the null-extended class)
    store.applyChanges("cust", Seq("custkey"), custs((7, "ap")), cKeys(1))
    IncrementalJoinView.refreshToCurrent(store, j)
    assertExact(store, j)

    // right churn against missing customers: a new dangling order, a
    // dangling one dies
    store.applyChanges("ord", Seq("oid"), orders((14, 9, 4.0)), oKeys(10))
    IncrementalJoinView.refreshToCurrent(store, j)
    assertExact(store, j)
  }

  test("full outer: 25 rounds of seeded churn on both sides stay " +
      "recompute-exact (small key palette, constant zero crossings)") {
    val store = freshStore()
    val j = jdef("f25", "full_outer")
    val rnd = new scala.util.Random(20260822L)
    val regions = Array("na", "eu", "ap")
    var liveCusts = Set.empty[Int]
    var liveOrders = Map.empty[Int, Int]
    var nextOid = 1
    def someKey() = rnd.nextInt(6) + 1 // 6 keys: plenty of collisions
    // seed: two custs, two orders (one dangling)
    Seq(1, 2).foreach(liveCusts += _)
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "eu")), cKeys())
    val seed = (1 to 2).map { _ =>
      val oid = nextOid; nextOid += 1
      val k = someKey(); liveOrders += oid -> k
      (oid, k, (rnd.nextInt(400) + 1) / 4.0)
    }
    store.applyChanges("ord", Seq("oid"), orders(seed: _*), oKeys())
    IncrementalJoinView.initialize(store, j)
    assertExact(store, j)

    (1 to 25).foreach { round =>
      if (round % 5 != 3) { // order churn
        val dels = rnd.shuffle(liveOrders.keys.toSeq.sorted)
          .take(rnd.nextInt(3))
        dels.foreach(liveOrders -= _)
        val upd = (liveOrders.keySet -- dels).toSeq.sorted.headOption
          .toSeq.filter(_ => rnd.nextBoolean()).map { oid =>
            val k = someKey(); liveOrders += oid -> k
            (oid, k, (rnd.nextInt(400) + 1) / 4.0)
          }
        val ins = (1 to rnd.nextInt(3)).map { _ =>
          val oid = nextOid; nextOid += 1
          val k = someKey(); liveOrders += oid -> k
          (oid, k, (rnd.nextInt(400) + 1) / 4.0)
        }
        store.applyChanges("ord", Seq("oid"),
          orders(ins ++ upd: _*), oKeys(dels: _*))
      }
      if (round % 4 != 2) { // customer churn: keys appear and die
        val cDel = rnd.shuffle(liveCusts.toSeq.sorted)
          .take(if (rnd.nextInt(3) == 0) 1 else 0)
        cDel.foreach(liveCusts -= _)
        val cIns = Seq(someKey()).filterNot(cDel.contains)
          .filterNot(liveCusts.contains)
          .filter(_ => rnd.nextBoolean())
          .map { k => liveCusts += k; (k, regions(rnd.nextInt(3))) }
        if (cDel.nonEmpty || cIns.nonEmpty)
          store.applyChanges("cust", Seq("custkey"),
            custs(cIns: _*), cKeys(cDel: _*))
      }
      IncrementalJoinView.refreshToCurrent(store, j)
      assertExact(store, j)
    }
  }

  test("group keys that can be null under the view's join type are " +
      "rejected; join keys always pass") {
    val store = freshStore()
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na")), cKeys())
    store.applyChanges("ord", Seq("oid"),
      orders((10, 1, 5.0)), oKeys())
    // full outer grouped by region (LEFT non-key: null on NE-right
    // rows) and by amount (RIGHT non-key: null on NE-left rows) —
    // both rejected; grouped by the join key — accepted
    val badL = jdef("v_badl", "full_outer").copy(vdef =
      ViewDef(Seq("region"), Nil))
    val e1 = intercept[IllegalArgumentException](
      IncrementalJoinView.initialize(store, badL))
    assert(e1.getMessage.contains("region"), e1.getMessage)
    // right_outer grouped by a LEFT non-key column: also rejected
    val badR = jdef("v_badr", "right_outer").copy(vdef =
      ViewDef(Seq("region"), Nil))
    val e2 = intercept[IllegalArgumentException](
      IncrementalJoinView.initialize(store, badR))
    assert(e2.getMessage.contains("region"), e2.getMessage)
    // but left_outer grouped by region is FINE (left never extends away)
    IncrementalJoinView.initialize(store,
      jdef("v_okl", "left_outer").copy(vdef = ViewDef(Seq("region"), Nil)))
  }
}
