package graft.cdc

import graft.TestSpark
import graft.cdc.IncrementalView.ViewDef
import graft.cdc.IncrementalJoinView.JoinViewDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** `IncrementalJoinView` — delta-join maintenance of views that JOIN
  * two mirrored tables (ΔJ = ΔA⋈B@to ∪ A@from⋈ΔB). The invariant:
  * after any chain of refreshes the view equals a recompute of the
  * CURRENT joined snapshot bit-for-bit, under churn on BOTH sides —
  * including join-key churn (an order moving between customers, a
  * customer dying under live orders) and dangling keys (orders whose
  * customer does not exist contribute nothing, exactly like the
  * inner-join recompute). */
class JoinViewIvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // left "ord"(oid, ck, amount) ⋈ right "cust"(custkey, region) ON
  // ck = custkey — DIFFERENT key names, so the right-rename contract
  // is always exercised; rightKeys == rightPks makes leg 1 a point
  // lookup, leftKeys != leftPks makes leg 2 the scan-with-broadcast
  private val jdef = JoinViewDef(
    left = "ord", leftPks = Seq("oid"),
    right = "cust", rightPks = Seq("custkey"),
    leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
    view = "rev", vdef = ViewDef(Seq("region"), Seq("amount")))

  private def freshStore() = new ParquetTableStore(spark,
    "file:" + Files.createTempDirectory("graft-jivm"), nBuckets = 8)

  private def orders(t: (Int, Int, Double)*): DataFrame =
    t.toDF("oid", "ck", "amount")
  private def custs(t: (Int, String)*): DataFrame =
    t.toDF("custkey", "region")
  private def oKeys(ids: Int*): DataFrame = ids.toDF("oid")
  private def cKeys(ids: Int*): DataFrame = ids.toDF("custkey")

  private def assertViewExact(store: ParquetTableStore): Unit = {
    val joined = store.read("ord").get.join(
      store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
    val expected = IncrementalView.compute(joined, jdef.vdef)
      .select("region", "n", "sum_amount")
    val got = store.read("rev").get.select("region", "n", "sum_amount")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"join view drifted:\ngot ${got.collect().toSeq}\n" +
        s"expected ${expected.collect().toSeq}")
  }

  test("churn on either side and on both advances the view to a " +
      "recompute of the joined snapshot") {
    val store = freshStore()
    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 5.0), (2, 10, 2.5), (3, 20, 4.0), (9, 99, 7.0)),
      oKeys()) // order 9 dangles: customer 99 never exists
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "na"), (20, "eu")), cKeys())
    IncrementalJoinView.initialize(store, jdef)
    assertViewExact(store)

    // LEFT-only churn: new order, amount update, delete
    store.applyChanges("ord", Seq("oid"),
      orders((4, 20, 1.0), (1, 10, 6.0)), oKeys(2))
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)

    // RIGHT-only churn: region move (group relocation of ALL its
    // orders' mass) + new customer
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "ap"), (30, "na")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    val ap = store.read("rev").get.filter(col("region") === "ap")
      .select("n", "sum_amount").as[(Long, BigDecimal)].head()
    assert(ap == ((1L, BigDecimal("6.0000000000"))), ap)

    // BOTH sides in one span, including JOIN-KEY churn both ways: an
    // order moves between customers; a customer dies under live orders
    store.applyChanges("ord", Seq("oid"),
      orders((3, 10, 4.0), (5, 30, 9.0)), oKeys())
    store.applyChanges("cust", Seq("custkey"), custs(), cKeys(20))
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    // eu vanished with customer 20 (order 4's mass has no join partner)
    assert(store.read("rev").get.filter(col("region") === "eu").isEmpty)

    // a dangling key coming ALIVE: customer 99 appears, order 9 joins in
    store.applyChanges("cust", Seq("custkey"), custs((99, "eu")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    val eu = store.read("rev").get.filter(col("region") === "eu")
      .select("n", "sum_amount").as[(Long, BigDecimal)].head()
    assert(eu == ((1L, BigDecimal("7.0000000000"))), eu)

    // no-change refresh is a no-op
    val before = store.version("rev")
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assert(store.version("rev") == before)
  }

  test("25 rounds of seeded churn on BOTH sides (inserts/updates/" +
      "deletes, join-key churn, dangling keys) stay recompute-exact") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260817L)
    val regions = Array("na", "eu", "ap")
    var liveOrders = Map.empty[Int, (Int, Double)] // oid -> (ck, amount)
    var liveCusts = Map.empty[Int, String]         // custkey -> region
    var nextOid = 1
    // customer keys from a SMALL palette (1..9) so orders often share
    // customers, deletes orphan real mass, and re-inserts resurrect it
    def someCk() = rnd.nextInt(9) + 1
    def insOrders(k: Int): Seq[(Int, Int, Double)] = (1 to k).map { _ =>
      val oid = nextOid; nextOid += 1
      val r = (oid, someCk(), (rnd.nextInt(400) + 1) / 4.0)
      liveOrders += oid -> ((r._2, r._3)); r
    }
    store.applyChanges("ord", Seq("oid"), orders(insOrders(12): _*), oKeys())
    val cs0 = (1 to 5).map(ck => (ck, regions(rnd.nextInt(3))))
    cs0.foreach { case (ck, r) => liveCusts += ck -> r }
    store.applyChanges("cust", Seq("custkey"), custs(cs0: _*), cKeys())
    IncrementalJoinView.initialize(store, jdef)
    assertViewExact(store)

    (1 to 25).foreach { round =>
      // LEFT churn (skipped some rounds so one-leg refreshes happen)
      if (round % 5 != 3) {
        val dels = rnd.shuffle(liveOrders.keys.toSeq.sorted.take(20))
          .take(rnd.nextInt(3))
        dels.foreach(liveOrders -= _)
        // join-key churn: an update MOVES an order between customers
        val upd = (liveOrders.keySet -- dels).toSeq.sorted.headOption
          .toSeq.filter(_ => rnd.nextBoolean()).map { oid =>
            val m = (oid, someCk(), (rnd.nextInt(400) + 1) / 4.0)
            liveOrders += oid -> ((m._2, m._3)); m
          }
        store.applyChanges("ord", Seq("oid"),
          orders(insOrders(rnd.nextInt(4)) ++ upd: _*), oKeys(dels: _*))
      }
      // RIGHT churn (its own skip phase)
      if (round % 4 != 2) {
        val cDel = liveCusts.keys.toSeq.sorted.headOption.toSeq
          .filter(_ => rnd.nextInt(3) == 0)
        cDel.foreach(liveCusts -= _)
        // region move, or a customer (re)appearing — resurrecting any
        // dangling orders pointing at its key
        val cUp = Seq(someCk()).filterNot(cDel.contains)
          .filter(_ => rnd.nextBoolean())
          .map { ck =>
            val r = (ck, regions(rnd.nextInt(3)))
            liveCusts += ck -> r._2; r
          }
        if (cDel.nonEmpty || cUp.nonEmpty)
          store.applyChanges("cust", Seq("custkey"),
            custs(cUp: _*), cKeys(cDel: _*))
      }
      IncrementalJoinView.refreshToCurrent(store, jdef)
      assertViewExact(store)
    }
  }

  test("min/max buffers ride join views: extremum deletes and join-key " +
      "moves splice; a drained buffer rebuilds from the JOINED snapshot") {
    val mmDef = jdef.copy(view = "revmm",
      vdef = ViewDef(Seq("region"), Seq("amount"),
        mins = Seq("amount"), maxs = Seq("amount"), bufK = 2))
    def assertMm(store: ParquetTableStore): Unit = {
      val joined = store.read("ord").get.join(
        store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
      val exp = IncrementalView.compute(joined, mmDef.vdef)
        .selectExpr("region", "n", "sum_amount",
          "element_at(minb_amount, 1)", "element_at(maxb_amount, 1)")
      val got = IncrementalJoinView.read(store, mmDef).get
        .selectExpr("region", "n", "sum_amount", "min_amount", "max_amount")
      assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
        s"mm join view drifted: ${got.collect().toSeq} vs " +
          s"${exp.collect().toSeq}")
    }
    val store = freshStore()
    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 1.0), (2, 10, 2.0), (3, 10, 3.0), (4, 20, 9.0)),
      oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "na"), (20, "eu")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm(store)
    // delete na's minimum order → buffer splice
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(1))
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm(store)
    // drain na's K=2 min buffer in one span (delete 2 and 3's old
    // values via a move + delete) → per-group rebuild from the JOINED
    // snapshot at the target version pair
    store.applyChanges("ord", Seq("oid"),
      orders((5, 10, 7.0), (6, 10, 8.0)), oKeys(2, 3))
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm(store)
    // a join-key CHURN on the right side moves a whole group's mass:
    // min/max must follow through the recompute
    store.applyChanges("cust", Seq("custkey"), custs((10, "eu")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm(store)
    assert(IncrementalJoinView.read(store, mmDef).get
      .filter(col("region") === "na").isEmpty)
  }

  test("a where predicate referencing columns OUTSIDE the aggregate set " +
      "maintains correctly (its references are parsed into the leg prune)") {
    val wDef = jdef.copy(view = "revw",
      vdef = ViewDef(Seq("region"), Seq("amount"),
        where = Some("oid % 2 = 0"))) // oid is in neither groupBy nor sums
    def assertW(store: ParquetTableStore): Unit = {
      val joined = store.read("ord").get.join(
        store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
      val exp = IncrementalView.compute(joined, wDef.vdef)
        .select("region", "n", "sum_amount")
      val got = store.read("revw").get.select("region", "n", "sum_amount")
      assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
        s"filtered join view drifted: ${got.collect().toSeq} vs " +
          s"${exp.collect().toSeq}")
    }
    val store = freshStore()
    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0), (4, 20, 4.0)),
      oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "na"), (20, "eu")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, wDef)
    assertW(store)
    // churn across the predicate boundary: delete an in-filter order,
    // update an out-of-filter one, move a customer
    store.applyChanges("ord", Seq("oid"),
      orders((3, 10, 5.0), (6, 20, 6.0)), oKeys(2))
    store.applyChanges("cust", Seq("custkey"), custs((20, "ap")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, wDef)
    assertW(store)
    // only even oids count: na has none left (2 deleted), ap has 4, 6
    assert(store.read("revw").get.filter(col("region") === "na").isEmpty)
  }

  test("join views CASCADE: a second join view over a maintained view's " +
      "own recorded change feed gives a three-table rollup, kept " +
      "recompute-exact under churn on all three tables") {
    val store = freshStore()
    // level 1: rev = ord ⋈ cust GROUP BY region (the spec's jdef);
    // level 2: rev2 = rev ⋈ regions GROUP BY continent — legal because
    // applyChanges records a change feed for EVERY table, including
    // the view table itself, so the maintained view is a first-class
    // delta source for the next view (the distinct-cascade move,
    // now across a JOIN)
    val jdef2 = IncrementalJoinView.JoinViewDef(
      left = "rev", leftPks = Seq("region"),
      right = "regions", rightPks = Seq("region"),
      leftKeys = Seq("region"), rightKeys = Seq("region"),
      view = "rev2",
      vdef = ViewDef(Seq("continent"), Seq("sum_amount")))
    def regions(t: (String, String)*): DataFrame =
      t.toDF("region", "continent")
    def rKeys(rs: String*): DataFrame = rs.toDF("region")

    def assertCascadeExact(): Unit = {
      // ground truth straight from the THREE base tables
      val exp = store.read("ord").get
        .join(store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
        .join(store.read("regions").get, "region")
        .groupBy("continent")
        .agg(count(lit(1)).as("orders"),
          sum(col("amount").cast("decimal(38,10)")).as("amt"))
      // rev2.n counts live REGION rows; its sum_sum_amount carries the
      // order mass — compare the mass and the region count separately
      val got = store.read("rev2").get
        .select(col("continent"), col("sum_sum_amount"))
      val expMass = exp.select(col("continent"), col("amt"))
      assert(got.except(expMass).isEmpty && expMass.except(got).isEmpty,
        s"cascade drifted: ${got.collect().toSeq} vs " +
          s"${expMass.collect().toSeq}")
    }

    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 5.0), (2, 20, 2.0), (3, 30, 4.0)), oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "na"), (20, "eu"), (30, "ap")), cKeys())
    store.applyChanges("regions", Seq("region"),
      regions(("na", "americas"), ("eu", "emea"), ("ap", "apac")), rKeys())
    val rnd = new scala.util.Random(20260818L)
    val regionNames = Array("na", "eu", "ap")
    val continents = Array("americas", "emea", "apac")
    var nextOid = 10
    (1 to 10).foreach { round =>
      // churn all three levels
      store.applyChanges("ord", Seq("oid"),
        orders((nextOid, Seq(10, 20, 30)(rnd.nextInt(3)),
          (rnd.nextInt(40) + 1) / 4.0)),
        oKeys(Seq(nextOid - 10).filter(o => o > 0 && rnd.nextBoolean()): _*))
      nextOid += 1
      if (round % 3 == 0) // customer moves region → rev groups move
        store.applyChanges("cust", Seq("custkey"),
          custs((Seq(10, 20, 30)(rnd.nextInt(3)),
            regionNames(rnd.nextInt(3)))), cKeys())
      if (round % 4 == 0) // region moves continent → rev2 groups move
        store.applyChanges("regions", Seq("region"),
          regions((regionNames(rnd.nextInt(3)),
            continents(rnd.nextInt(3)))), rKeys())
      // advance level 1 first, then level 2 off rev's own feed
      IncrementalJoinView.refreshToCurrent(store, jdef)
      IncrementalJoinView.refreshToCurrent(store, jdef2)
      assertViewExact(store)
      assertCascadeExact()
    }
  }

  // ---------------- three-table chains (JoinViewChain) ----------------

  // cust(custkey, segment) ⋈ ord(oid, ck) ⋈ item(iid, oid, amount):
  // link 1 materializes the ROW-LEVEL joined relation (one group per
  // order carrying its customer's segment, n = 1); link 2 joins the
  // items against that view's own recorded change feed and rolls the
  // revenue up by segment — the verdict-#5 shape (the earlier cascade
  // test rolls up an AGGREGATE; this one composes at row level, which
  // is what customer⋈orders⋈lineitem actually needs).
  private val chain3 = IncrementalJoinView.JoinViewChain(Seq(
    JoinViewDef(
      left = "ord", leftPks = Seq("oid"),
      right = "cust", rightPks = Seq("custkey"),
      leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
      view = "ordseg", vdef = ViewDef(Seq("oid", "segment"), Nil)),
    JoinViewDef(
      left = "ordseg", leftPks = Seq("oid", "segment"),
      right = "item", rightPks = Seq("iid"),
      leftKeys = Seq("oid"), rightKeys = Seq("oid"),
      view = "rev3", vdef = ViewDef(Seq("segment"), Seq("amount")))))

  private def custSeg(t: (Int, String)*): DataFrame =
    t.toDF("custkey", "segment")
  private def ord2(t: (Int, Int)*): DataFrame = t.toDF("oid", "ck")
  private def items(t: (Int, Int, Double)*): DataFrame =
    t.toDF("iid", "oid", "amount")
  private def iKeys(ids: Int*): DataFrame = ids.toDF("iid")

  private def assertChainExact(store: ParquetTableStore): Unit = {
    // a base or view emptied by churn reads None (empty manifest) —
    // "no rows" is a valid state the chain must track, not a test crash
    val expRows = (for {
      o <- store.read("ord"); c <- store.read("cust"); i <- store.read("item")
    } yield {
      val joined = o.join(c.withColumnRenamed("custkey", "ck"), "ck")
        .join(i.drop("iid").withColumnRenamed("oid", "o2"),
          col("oid") === col("o2"))
      IncrementalView.compute(joined, chain3.defs.last.vdef)
        .select("segment", "n", "sum_amount").collect().toSet
    }).getOrElse(Set.empty)
    val gotRows = store.read("rev3")
      .map(_.select("segment", "n", "sum_amount").collect().toSet)
      .getOrElse(Set.empty)
    assert(gotRows == expRows,
      s"3-way chain drifted:\ngot $gotRows\nexpected $expRows")
  }

  test("three-table ROW-LEVEL rollup via JoinViewChain: 25 rounds of " +
      "seeded churn on ALL THREE tables stay recompute-exact, " +
      "including a crash window between the chain's legs") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260819L)
    val segs = Array("auto", "mach", "house")
    var liveC = Map.empty[Int, String]        // custkey -> segment
    var liveO = Map.empty[Int, Int]           // oid -> ck
    var liveI = Map.empty[Int, (Int, Double)] // iid -> (oid, amount)
    var (nextO, nextI) = (1, 1)
    def someCk() = rnd.nextInt(6) + 1
    def insO(k: Int) = (1 to k).map { _ =>
      val o = nextO; nextO += 1; liveO += o -> someCk(); (o, liveO(o))
    }
    def insI(k: Int) = (1 to k).map { _ =>
      val i = nextI; nextI += 1
      val oid = if (liveO.isEmpty) 999 else
        liveO.keys.toSeq.sorted.apply(rnd.nextInt(liveO.size))
      val r = (i, oid, (rnd.nextInt(200) + 1) / 4.0)
      liveI += i -> ((r._2, r._3)); r
    }
    (1 to 4).foreach(ck => liveC += ck -> segs(rnd.nextInt(3)))
    store.applyChanges("cust", Seq("custkey"),
      custSeg(liveC.toSeq.sortBy(_._1): _*), cKeys())
    store.applyChanges("ord", Seq("oid"), ord2(insO(8): _*), oKeys())
    store.applyChanges("item", Seq("iid"), items(insI(15): _*), iKeys())
    IncrementalJoinView.refreshToCurrent(store, chain3)
    assertChainExact(store)

    (1 to 25).foreach { round =>
      // customers: segment moves + occasional death/rebirth
      if (round % 4 != 1) {
        val cDel = liveC.keys.toSeq.sorted.headOption.toSeq
          .filter(_ => rnd.nextInt(4) == 0)
        cDel.foreach(liveC -= _)
        val cUp = Seq(someCk()).filterNot(cDel.contains)
          .filter(_ => rnd.nextBoolean()).map { ck =>
            liveC += ck -> segs(rnd.nextInt(3)); (ck, liveC(ck))
          }
        if (cDel.nonEmpty || cUp.nonEmpty)
          store.applyChanges("cust", Seq("custkey"),
            custSeg(cUp: _*), cKeys(cDel: _*))
      }
      // orders: inserts, deletes (orphaning their items' mass), and
      // customer moves (relocating item mass across segments)
      if (round % 5 != 2) {
        val oDel = liveO.keys.toSeq.sorted.take(12)
          .filter(_ => rnd.nextInt(6) == 0).take(2)
        oDel.foreach(liveO -= _)
        val oUp = (liveO.keySet -- oDel).toSeq.sorted.headOption.toSeq
          .filter(_ => rnd.nextBoolean()).map { o =>
            liveO += o -> someCk(); (o, liveO(o))
          }
        store.applyChanges("ord", Seq("oid"),
          ord2(insO(rnd.nextInt(3)) ++ oUp: _*), oKeys(oDel: _*))
      }
      // items: inserts, amount updates, moves between orders, deletes
      if (round % 3 != 0) {
        val iDel = liveI.keys.toSeq.sorted.take(10)
          .filter(_ => rnd.nextInt(5) == 0).take(2)
        iDel.foreach(liveI -= _)
        val iUp = (liveI.keySet -- iDel).toSeq.sorted.headOption.toSeq
          .filter(_ => rnd.nextBoolean()).map { i =>
            val oid = if (liveO.isEmpty) 999 else
              liveO.keys.toSeq.sorted.apply(rnd.nextInt(liveO.size))
            val m = (i, oid, (rnd.nextInt(200) + 1) / 4.0)
            liveI += i -> ((m._2, m._3)); m
          }
        store.applyChanges("item", Seq("iid"),
          items(insI(rnd.nextInt(4)) ++ iUp: _*), iKeys(iDel: _*))
      }
      if (round == 13) {
        // crash window BETWEEN the chain's legs: the upstream link
        // advances, the downstream never runs — the next chain refresh
        // must catch the downstream up exactly once (each leg its own
        // marker/intent protocol)
        IncrementalJoinView.refreshToCurrent(store, chain3.defs.head)
      }
      IncrementalJoinView.refreshToCurrent(store, chain3)
      assertChainExact(store)
    }
    // no-change chain refresh is a no-op on every link
    val vBefore = (store.version("ordseg"), store.version("rev3"))
    IncrementalJoinView.refreshToCurrent(store, chain3)
    assert((store.version("ordseg"), store.version("rev3")) == vBefore)
  }

  test("a chain break (wrong left table or wrong leftPks) fails at " +
      "construction, not mid-refresh") {
    val j1 = chain3.defs.head
    val j2 = chain3.defs.last
    intercept[IllegalArgumentException] {
      IncrementalJoinView.JoinViewChain(Seq(j1, j2.copy(left = "elsewhere")))
    }
    intercept[IllegalArgumentException] {
      IncrementalJoinView.JoinViewChain(Seq(j1, j2.copy(leftPks = Seq("oid"))))
    }
  }

  test("crash between view merge and marker: the intent protocol " +
      "applies the interrupted refresh exactly once") {
    val store = freshStore()
    store.applyChanges("ord", Seq("oid"),
      orders((1, 10, 1.0), (2, 20, 2.0)), oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((10, "na"), (20, "eu")), cKeys())
    val (vL1, vR1) = IncrementalJoinView.initialize(store, jdef)

    store.applyChanges("ord", Seq("oid"), orders((3, 10, 3.0)), oKeys())
    val vL2 = store.version("ord").get

    // CASE A — crash AFTER the merge committed, BEFORE _REFLECTS
    val viewBefore = store.version("rev").getOrElse("")
    store.writeMarker("rev", IncrementalView.IntentMarker,
      s"$vL1,$vR1\t$vL2,$vR1\t$viewBefore")
    IncrementalJoinView.refresh(store, jdef, vL1, vL2, vR1, vR1)
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    assert(store.readMarker("rev", IncrementalView.ReflectsMarker)
      .contains(s"$vL2,$vR1"))
    assert(store.readMarker("rev", IncrementalView.IntentMarker).isEmpty)

    // CASE B — crash BEFORE the merge committed: stale intent whose
    // viewBefore equals the current view version is discarded and the
    // refresh runs normally
    store.applyChanges("cust", Seq("custkey"), custs((10, "ap")), cKeys())
    val vR2 = store.version("cust").get
    store.writeMarker("rev", IncrementalView.IntentMarker,
      s"$vL2,$vR1\t$vL2,$vR2\t${store.version("rev").getOrElse("")}")
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    assert(store.readMarker("rev", IncrementalView.ReflectsMarker)
      .contains(s"$vL2,$vR2"))
  }

  test("a vacuumed reflected version rebuilds; half-present and empty " +
      "bases initialize to an empty view instead of failing") {
    val store = freshStore()
    // only the LEFT exists: initialize → empty view, sentinel pair
    store.applyChanges("ord", Seq("oid"), orders((1, 10, 1.0)), oKeys())
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assert(store.read("rev").isEmpty ||
      store.read("rev").get.isEmpty)
    // the right appears → the next refresh re-initializes off the
    // empty-sentinel and the view materializes
    store.applyChanges("cust", Seq("custkey"), custs((10, "na")), cKeys())
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
    assert(store.read("rev").get.count() == 1)

    // churn a few versions, vacuum the reflected LEFT version away →
    // rebuild path (no feed span can serve it)
    store.applyChanges("ord", Seq("oid"), orders((2, 10, 2.0)), oKeys())
    store.applyChanges("ord", Seq("oid"), orders((3, 10, 3.0)), oKeys())
    store.applyChanges("ord", Seq("oid"), orders((4, 10, 4.0)), oKeys(1))
    store.vacuum("ord", keep = 1, minAgeMs = 0L)
    IncrementalJoinView.refreshToCurrent(store, jdef)
    assertViewExact(store)
  }

  // ---------------- riding MirrorPipeline streaming ----------------

  private def esc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeBatch(dir: Path, n: Int,
      rows: Seq[(String, String, String, Int, Long)]): Unit = {
    val lines = rows.map { case (topic, key, value, part, off) =>
      val v = if (value == null) "null" else esc(value)
      s"""{"topic": ${esc(topic)}, "key": ${esc(key)}, "value": $v,""" +
        s""""partition": $part, "offset": $off}"""
    }
    Files.write(dir.resolve(s"batch_$n.json"), lines.mkString("\n").getBytes)
  }

  /** Debezium order envelope (reference orders schema: id/order_date/
    * purchaser/quantity/product; join key purchaser → customers.id). */
  private def order(op: String, id: Long, purchaser: Int, quantity: Int,
      before: Option[(Long, Int, Int)] = None): String = {
    def row(i: Long, p: Int, q: Int) =
      s"""{"id": $i, "order_date": "2026-02-01", "purchaser": $p,""" +
        s""" "quantity": $q, "product": "p$i"}"""
    val after = if (op == "d") "null" else row(id, purchaser, quantity)
    val beforeJson = before match {
      case Some((bi, bp, bq)) => row(bi, bp, bq)
      case None => if (op == "u" || op == "d") row(id, purchaser, quantity)
        else "null"
    }
    s"""{"before": $beforeJson, "after": $after, "source": {"db": "app",""" +
      s""" "table": "orders", "ts_ms": 1769558400000}, "op": "$op",""" +
      s""" "ts_ms": 1769558400001}"""
  }

  private def rawOrder(value: String, offset: Long)
      : (String, String, String, Int, Long) =
    ("mysql.app.orders", """{"id": 1}""", value, 0, offset)

  // the reference's natural downstream shape: orders ⋈ customers ON
  // purchaser = id, quantity rolled up by the customer's last name
  private val refJdef = JoinViewDef(
    left = "orders", leftPks = Seq("id"),
    right = "customers", rightPks = Seq("id"),
    leftKeys = Seq("purchaser"), rightKeys = Seq("id"),
    view = "qty_by_last", vdef = ViewDef(Seq("last_name"), Seq("quantity")))

  private def assertRefExact(store: ParquetTableStore): Unit = {
    val joined = store.read("orders").get.join(
      store.read("customers").get.withColumnRenamed("id", "purchaser"),
      "purchaser")
    val expected = IncrementalView.compute(joined, refJdef.vdef)
      .select("last_name", "n", "sum_quantity")
    val got = store.read("qty_by_last").get
      .select("last_name", "n", "sum_quantity")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"join view != mirror recompute: ${got.collect().toSeq} vs " +
        s"${expected.collect().toSeq}")
  }

  test("orders ⋈ customers rollup rides MirrorPipeline per micro-batch " +
      "and survives a replay restart") {
    val in = Files.createTempDirectory("jmirror-in")
    val ckpt = Files.createTempDirectory("jmirror-ckpt")
    val storeRoot = "file:" + Files.createTempDirectory("jmirror-store")
    val catalog = CdcCatalog.fromPropertiesString(
      "pk.customers=id\npk.orders=id\n")
    val store = new ParquetTableStore(spark, storeRoot)

    writeBatch(in, 0, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Walker", "g@x"), 1),
      rawOrder(order("r", 100, 1, 3), 2),
      rawOrder(order("r", 101, 1, 5), 3),
      rawOrder(order("r", 102, 2, 7), 4)))
    val q = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot, Nil, ckpt.toString,
      joinViews = Seq(refJdef))
    try {
      q.processAllAvailable()
      assertRefExact(store)
      assert(store.read("qty_by_last").get
        .select("last_name", "n").as[(String, Long)].collect().toMap ==
        Map("Thomas" -> 2L, "Walker" -> 1L))

      // batch 2: an order MOVES between customers (join-key churn), a
      // customer is renamed (its whole rollup mass relocates), one
      // order dies
      writeBatch(in, 1, Seq(
        rawOrder(order("u", 101, 2, 5, before = Some((101, 1, 5))), 5),
        Fixtures.raw(Fixtures.customer("u", 2, "George", "Bush", "g@x"), 6),
        rawOrder(order("d", 102, 2, 7, before = Some((102, 2, 7))), 7)))
      q.processAllAvailable()
      assertRefExact(store)
      assert(store.read("qty_by_last").get
        .selectExpr("last_name", "CAST(sum_quantity AS BIGINT)")
        .as[(String, Long)].collect().toMap ==
        Map("Thomas" -> 3L, "Bush" -> 5L))
    } finally q.stop()

    // restart WITHOUT the checkpoint: both files replay — identical
    // merges net zero feeds and the join view stays exactly consistent
    val ckpt2 = Files.createTempDirectory("jmirror-ckpt2")
    val q2 = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot, Nil, ckpt2.toString,
      joinViews = Seq(refJdef))
    try {
      q2.processAllAvailable()
      assertRefExact(store)
    } finally q2.stop()
  }

  // ------------- three-table chain riding MirrorPipeline -------------

  private val itemsRow = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("order_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("amount",
      org.apache.spark.sql.types.DoubleType)))

  private def item(op: String, id: Long, orderId: Long, amount: Double,
      before: Option[(Long, Long, Double)] = None): String = {
    def row(i: Long, o: Long, a: Double) =
      s"""{"id": $i, "order_id": $o, "amount": $a}"""
    val after = if (op == "d") "null" else row(id, orderId, amount)
    val beforeJson = before match {
      case Some((bi, bo, ba)) => row(bi, bo, ba)
      case None => if (op == "u" || op == "d") row(id, orderId, amount)
        else "null"
    }
    s"""{"before": $beforeJson, "after": $after, "source": {"db": "app",""" +
      s""" "table": "items", "ts_ms": 1769558400000}, "op": "$op",""" +
      s""" "ts_ms": 1769558400001}"""
  }

  private def rawItem(value: String, offset: Long)
      : (String, String, String, Int, Long) =
    ("mysql.app.items", """{"id": 1}""", value, 0, offset)

  // customers ⋈ orders ⋈ items: link 1 materializes the row-level
  // order×customer relation keyed by the order id, link 2 rolls item
  // amounts up by the customer's last name off link 1's own feed
  private val chainM = IncrementalJoinView.JoinViewChain(Seq(
    JoinViewDef(
      left = "orders", leftPks = Seq("id"),
      right = "customers", rightPks = Seq("id"),
      leftKeys = Seq("purchaser"), rightKeys = Seq("id"),
      view = "ordcust", vdef = ViewDef(Seq("id", "last_name"), Nil)),
    JoinViewDef(
      left = "ordcust", leftPks = Seq("id", "last_name"),
      right = "items", rightPks = Seq("id"),
      leftKeys = Seq("id"), rightKeys = Seq("order_id"),
      view = "rev3m", vdef = ViewDef(Seq("last_name"), Seq("amount")),
      rightRename = Map("id" -> "item_id"))))

  private def assertChainMirrorExact(store: ParquetTableStore): Unit = {
    val joined = store.read("orders").get
      .join(store.read("customers").get.withColumnRenamed("id", "purchaser"),
        "purchaser")
      .join(store.read("items").get
          .select(col("order_id"), col("amount")),
        col("id") === col("order_id"))
    val expected = IncrementalView.compute(joined, chainM.defs.last.vdef)
      .select("last_name", "n", "sum_amount")
    val got = store.read("rev3m").get.select("last_name", "n", "sum_amount")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"3-way mirror chain drifted: ${got.collect().toSeq} vs " +
        s"${expected.collect().toSeq}")
  }

  test("customers ⋈ orders ⋈ items chain rides MirrorPipeline per " +
      "micro-batch (all three tables churning) and survives a replay " +
      "restart — crash protocol per leg") {
    val in = Files.createTempDirectory("j3mirror-in")
    val ckpt = Files.createTempDirectory("j3mirror-ckpt")
    val storeRoot = "file:" + Files.createTempDirectory("j3mirror-store")
    val catalog = CdcCatalog.fromPropertiesString(
      "pk.customers=id\npk.orders=id\npk.items=id\n")
    val registry = Envelope.defaultRegistry + ("items" -> itemsRow)
    val store = new ParquetTableStore(spark, storeRoot)

    writeBatch(in, 0, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Walker", "g@x"), 1),
      rawOrder(order("r", 100, 1, 3), 2),
      rawOrder(order("r", 101, 2, 5), 3),
      rawItem(item("r", 1, 100, 10.5), 4),
      rawItem(item("r", 2, 100, 2.25), 5),
      rawItem(item("r", 3, 101, 8.0), 6)))
    val q = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      registry, storeRoot, Nil, ckpt.toString,
      joinViews = chainM.defs)
    try {
      q.processAllAvailable()
      assertChainMirrorExact(store)
      assert(store.read("rev3m").get
        .selectExpr("last_name", "n", "CAST(sum_amount AS DOUBLE)")
        .as[(String, Long, Double)].collect()
        .map { case (k, n, s) => k -> ((n, s)) }.toMap ==
        Map("Thomas" -> ((2L, 12.75)), "Walker" -> ((1L, 8.0))))

      // batch 2: churn on ALL THREE tables in one micro-batch — an
      // item moves between orders, a customer is renamed (its whole
      // item mass relocates through BOTH links), an order moves
      // between customers, and an item dies
      writeBatch(in, 1, Seq(
        rawItem(item("u", 3, 100, 8.0, before = Some((3, 101, 8.0))), 7),
        Fixtures.raw(Fixtures.customer("u", 1, "Sally", "Marsh", "s@x"), 8),
        rawOrder(order("u", 101, 1, 5, before = Some((101, 2, 5))), 9),
        rawItem(item("d", 2, 100, 2.25, before = Some((2, 100, 2.25))), 10)))
      q.processAllAvailable()
      assertChainMirrorExact(store)
      // everything now hangs off Marsh: items 1 (10.5) and 3 (8.0)
      assert(store.read("rev3m").get
        .selectExpr("last_name", "CAST(sum_amount AS DOUBLE)")
        .as[(String, Double)].collect().toMap == Map("Marsh" -> 18.5))
    } finally q.stop()

    // restart WITHOUT the checkpoint: all files replay — identical
    // merges net zero feeds on every link and the chain stays exact
    val ckpt2 = Files.createTempDirectory("j3mirror-ckpt2")
    val q2 = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      registry, storeRoot, Nil, ckpt2.toString,
      joinViews = chainM.defs)
    try {
      q2.processAllAvailable()
      assertChainMirrorExact(store)
    } finally q2.stop()
  }
}
