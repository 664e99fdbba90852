package graft.cdc

import graft.TestSpark
import graft.cdc.IncrementalView.ViewDef
import graft.cdc.IncrementalJoinView.JoinViewDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-12 join-view completions: COUNT(DISTINCT) cascades riding
  * join views, and LEFT OUTER maintenance via match-count transition
  * legs (IncrementalJoinView.scala's leg 3/leg 4 algebra). The
  * invariant everywhere: after any chain of refreshes the view equals
  * a recompute of the CURRENT joined snapshot bit-for-bit — including
  * the exact distinct counts and the null-extended (zero-match)
  * class, under churn that drives per-key match counts through zero
  * in both directions. */
class JoinViewOuterDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore() = new ParquetTableStore(spark,
    "file:" + Files.createTempDirectory("graft-jodv"), nBuckets = 8)

  private def orders(t: (Int, Int, Double)*): DataFrame =
    t.toDF("oid", "ck", "amount")
  private def custs(t: (Int, String)*): DataFrame =
    t.toDF("custkey", "region")
  private def oKeys(ids: Int*): DataFrame = ids.toDF("oid")
  private def cKeys(ids: Int*): DataFrame = ids.toDF("custkey")

  /** Ground truth straight from the base tables: the joined snapshot
    * aggregated with Spark's own count/sum/countDistinct (countDistinct
    * ignores nulls — the cascade's contract on null-extended rows).
    * `rightDDL` is the NORMALIZED right shape, standing in when the
    * right table's manifest is empty (all rows deleted → schema-less). */
  private def recompute(store: ParquetTableStore, j: JoinViewDef,
      rightDDL: String): DataFrame = {
    val l = store.read(j.left).get
    // an all-rows-deleted right table reads as None (empty manifest)
    val rRaw = store.read(j.right).getOrElse(spark.emptyDataFrame)
    val r =
      if (rRaw.columns.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(rightDDL))
      else j.rightKeys.zip(j.leftKeys).foldLeft(
        j.rightRename.foldLeft(rRaw) { case (d, (f, t)) => d.withColumnRenamed(f, t) }
      ) { case (d, (rk, lk)) => if (rk == lk) d else d.withColumnRenamed(rk, lk) }
    val joined = l.join(r, j.leftKeys, j.joinType)
    joined.groupBy(j.vdef.groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (j.vdef.sums.map(c => sum(col(c).cast("decimal(38,10)"))
          .as(s"sum_$c")) ++
         j.vdef.distincts.map(c => countDistinct(col(c)).as(s"nd_$c"))): _*)
  }

  private def assertExact(store: ParquetTableStore, j: JoinViewDef,
      rightDDL: String = "oid INT, custkey INT, amount DOUBLE"): Unit = {
    val cols = (j.vdef.groupBy :+ "n") ++
      j.vdef.sums.map(c => s"sum_$c") ++ j.vdef.distincts.map(c => s"nd_$c")
    val exp = recompute(store, j, rightDDL).select(cols.map(col): _*)
    val got = IncrementalJoinView.read(store, j).get.select(cols.map(col): _*)
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
      s"join view '${j.view}' drifted:\ngot ${got.collect().toSeq}\n" +
        s"expected ${exp.collect().toSeq}")
  }

  // ------------- COUNT(DISTINCT) on an INNER join view -------------

  // the verdict's named shape: distinct purchasers per region over
  // orders ⋈ customers — distinct over the JOIN KEY column itself,
  // so join-key churn directly churns the distinct sets
  private val ndInner = JoinViewDef(
    left = "ord", leftPks = Seq("oid"),
    right = "cust", rightPks = Seq("custkey"),
    leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
    view = "nd_rev",
    vdef = ViewDef(Seq("region"), Seq("amount"), distincts = Seq("ck")))

  test("COUNT(DISTINCT) rides an inner join view through 25 rounds of " +
      "both-sides seeded churn including join-key churn") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260819L)
    val regions = Array("na", "eu", "ap")
    var liveOrders = Map.empty[Int, (Int, Double)]
    var liveCusts = Map.empty[Int, String]
    var nextOid = 1
    def someCk() = rnd.nextInt(7) + 1
    def insOrders(k: Int): Seq[(Int, Int, Double)] = (1 to k).map { _ =>
      val oid = nextOid; nextOid += 1
      val r = (oid, someCk(), (rnd.nextInt(400) + 1) / 4.0)
      liveOrders += oid -> ((r._2, r._3)); r
    }
    store.applyChanges("ord", Seq("oid"), orders(insOrders(10): _*), oKeys())
    val cs0 = (1 to 5).map(ck => (ck, regions(rnd.nextInt(3))))
    cs0.foreach { case (ck, r) => liveCusts += ck -> r }
    store.applyChanges("cust", Seq("custkey"), custs(cs0: _*), cKeys())
    IncrementalJoinView.initialize(store, ndInner)
    assertExact(store, ndInner)

    (1 to 25).foreach { round =>
      if (round % 5 != 3) {
        val dels = rnd.shuffle(liveOrders.keys.toSeq.sorted.take(20))
          .take(rnd.nextInt(3))
        dels.foreach(liveOrders -= _)
        // join-key churn: an order MOVES between customers — the old
        // customer may lose its LAST order (distinct purchaser dies in
        // its region), the new one may gain its first
        val upd = (liveOrders.keySet -- dels).toSeq.sorted.headOption
          .toSeq.filter(_ => rnd.nextBoolean()).map { oid =>
            val m = (oid, someCk(), (rnd.nextInt(400) + 1) / 4.0)
            liveOrders += oid -> ((m._2, m._3)); m
          }
        store.applyChanges("ord", Seq("oid"),
          orders(insOrders(rnd.nextInt(3)) ++ upd: _*), oKeys(dels: _*))
      }
      if (round % 4 != 2) {
        val cDel = liveCusts.keys.toSeq.sorted.headOption.toSeq
          .filter(_ => rnd.nextInt(3) == 0)
        cDel.foreach(liveCusts -= _)
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
      IncrementalJoinView.refreshToCurrent(store, ndInner)
      assertExact(store, ndInner, "custkey INT, region STRING")
    }
  }

  // --------------------- LEFT OUTER join views ---------------------

  // customers ⟕ orders: every customer counts, matched or not; the
  // right side's oid doubles as the distinct column (orders per
  // region, zero-order customers included with nd = 0)
  private val outerDef = JoinViewDef(
    left = "cust", leftPks = Seq("custkey"),
    right = "ord", rightPks = Seq("oid"),
    leftKeys = Seq("custkey"), rightKeys = Seq("ck"),
    view = "cview",
    vdef = ViewDef(Seq("region"), Seq("amount"), distincts = Seq("oid")),
    joinType = "left_outer")

  test("left-outer: match counts crossing zero in BOTH directions emit " +
      "and retract the null-extended class exactly") {
    val store = freshStore()
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "eu"), (3, "na")), cKeys()) // 3 is orderless
    store.applyChanges("ord", Seq("oid"),
      orders((10, 1, 5.0), (11, 1, 2.0), (12, 2, 3.0)), oKeys())
    IncrementalJoinView.initialize(store, outerDef)
    assertExact(store, outerDef)
    // na: cust1⋈{10,11} + cust3 null-extended → n=3, sum=7, nd=2
    val na0 = IncrementalJoinView.read(store, outerDef).get
      .filter(col("region") === "na")
      .select("n", "sum_amount", "nd_oid")
      .as[(Long, BigDecimal, Long)].head()
    assert(na0 == ((3L, BigDecimal("7.0000000000"), 2L)), na0)

    // positive→zero AND zero→positive in ONE span: cust1 loses ALL
    // orders (its null-extended row is BORN), cust3 gains its first
    // (its null-extended row RETRACTS)
    store.applyChanges("ord", Seq("oid"),
      orders((13, 3, 4.0)), oKeys(10, 11))
    IncrementalJoinView.refreshToCurrent(store, outerDef)
    assertExact(store, outerDef)

    // join-key churn stranding the source: order 12 moves cust2→cust3,
    // cust2's match count hits zero
    store.applyChanges("ord", Seq("oid"), orders((12, 3, 3.0)), oKeys())
    IncrementalJoinView.refreshToCurrent(store, outerDef)
    assertExact(store, outerDef)
    val eu = IncrementalJoinView.read(store, outerDef).get
      .filter(col("region") === "eu").select("n", "nd_oid")
      .as[(Long, Long)].head()
    assert(eu == ((1L, 0L)), eu) // cust2 survives null-extended

    // LEFT churn against unmatched keys: a new orderless customer
    // (ΔL null-extends), an orderless customer dies (retract), and a
    // matched customer changes region (group relocation)
    store.applyChanges("cust", Seq("custkey"),
      custs((4, "ap"), (3, "eu")), cKeys(2))
    IncrementalJoinView.refreshToCurrent(store, outerDef)
    assertExact(store, outerDef)

    // BOTH sides at the SAME key in one span: cust3's region moves
    // while it loses all its orders — leg 2 and the transition leg
    // must both stand on A@fromL for the algebra to cancel exactly
    store.applyChanges("cust", Seq("custkey"), custs((3, "na")), cKeys())
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(12, 13))
    IncrementalJoinView.refreshToCurrent(store, outerDef)
    assertExact(store, outerDef)
    val na1 = IncrementalJoinView.read(store, outerDef).get
      .filter(col("region") === "na").select("n", "nd_oid")
      .as[(Long, Long)].head()
    assert(na1 == ((2L, 0L)), na1) // custs 1 and 3, both orderless now
  }

  test("left-outer + distinct: 25 rounds of seeded churn stay " +
      "recompute-exact and the zero-match class matches the batch " +
      "left-anti count (the q_tpch_q13 zero-order shape)") {
    val store = freshStore()
    // per-customer view: nd_oid IS the customer's order count, so the
    // zero-order class of TPC-H Q13 is exactly the nd_oid = 0 rows
    val perCust = outerDef.copy(view = "ord_per_cust",
      vdef = ViewDef(Seq("custkey"), Nil, distincts = Seq("oid")))
    val rnd = new scala.util.Random(20260820L)
    val regions = Array("na", "eu", "ap")
    var nextOid = 1
    var liveOrders = Map.empty[Int, Int] // oid -> ck
    def someCk() = rnd.nextInt(8) + 1
    // customers 1..8 always live (left churn = region moves + key 9
    // appearing/dying); SMALL order pool so match counts cross zero
    // constantly. Orders start with TWO rows: null extension needs the
    // right SHAPE observed at least once (the documented schema-
    // sidecar boundary) — after this seeding the pool may drain to
    // empty freely, the sidecar carries the types
    val seed = (1 to 2).map { _ =>
      val oid = nextOid; nextOid += 1
      val ck = someCk(); liveOrders += oid -> ck
      (oid, ck, (rnd.nextInt(400) + 1) / 4.0)
    }
    store.applyChanges("cust", Seq("custkey"),
      custs((1 to 8).map(ck => (ck, regions(rnd.nextInt(3)))): _*), cKeys())
    store.applyChanges("ord", Seq("oid"), orders(seed: _*), oKeys())
    IncrementalJoinView.initialize(store, outerDef)
    IncrementalJoinView.initialize(store, perCust)
    assertExact(store, outerDef)

    var nineLive = false
    (1 to 25).foreach { round =>
      if (round % 5 != 3) {
        val dels = rnd.shuffle(liveOrders.keys.toSeq.sorted)
          .take(rnd.nextInt(3))
        dels.foreach(liveOrders -= _)
        // upd picked BEFORE ins: one row per PK per batch (the store's
        // merge contract — the CDC path compacts to last-writer-wins
        // before the sink, so a frame must not carry a PK twice)
        val upd = (liveOrders.keySet -- dels).toSeq.sorted.headOption
          .toSeq.filter(_ => rnd.nextBoolean()).map { oid =>
            val ck = someCk(); liveOrders += oid -> ck
            (oid, ck, (rnd.nextInt(400) + 1) / 4.0)
          }
        val ins = (1 to rnd.nextInt(3)).map { _ =>
          val oid = nextOid; nextOid += 1
          val ck = someCk(); liveOrders += oid -> ck
          (oid, ck, (rnd.nextInt(400) + 1) / 4.0)
        }
        store.applyChanges("ord", Seq("oid"),
          orders(ins ++ upd: _*), oKeys(dels: _*))
      }
      if (round % 4 == 0) { // left churn: region move + key 9 toggling
        val moves = Seq((someCk(), regions(rnd.nextInt(3)))) ++
          (if (!nineLive) Seq((9, regions(rnd.nextInt(3)))) else Nil)
        val dels = if (nineLive) Seq(9) else Nil
        nineLive = !nineLive
        store.applyChanges("cust", Seq("custkey"),
          custs(moves: _*), cKeys(dels: _*))
      }
      IncrementalJoinView.refreshToCurrent(store, outerDef)
      IncrementalJoinView.refreshToCurrent(store, perCust)
      assertExact(store, outerDef)

      // the q13 anchor: customers with nd_oid = 0 == the left-anti set
      val zeroClass = IncrementalJoinView.read(store, perCust).get
        .filter(col("nd_oid") === 0).count()
      val antiCount = store.read("ord") match {
        case Some(o) if o.columns.nonEmpty =>
          store.read("cust").get.join(
            o.withColumnRenamed("ck", "custkey"),
            Seq("custkey"), "left_anti").count()
        case _ => store.read("cust").get.count()
      }
      assert(zeroClass == antiCount,
        s"round $round: zero-order class $zeroClass != left-anti $antiCount")
    }
  }

  // ------------------------- validation -------------------------

  test("JoinViewDef misconfigurations fail at the definition boundary, " +
      "not as mid-refresh analysis errors") {
    val store = freshStore()
    // 'note' exists on BOTH sides → disjointness error names it
    Seq((1, 10, "x")).toDF("oid", "ck", "note")
      .pipe(df => store.applyChanges("lhs", Seq("oid"), df, oKeys()))
    Seq((10, "na", "y")).toDF("custkey", "region", "note")
      .pipe(df => store.applyChanges("rhs", Seq("custkey"), df, cKeys()))
    val clash = JoinViewDef("lhs", Seq("oid"), "rhs", Seq("custkey"),
      Seq("ck"), Seq("custkey"), "v1", ViewDef(Seq("region"), Nil))
    val e1 = intercept[IllegalArgumentException](
      IncrementalJoinView.initialize(store, clash))
    assert(e1.getMessage.contains("note") &&
      e1.getMessage.contains("disjoint"), e1.getMessage)

    // key rename landing on an existing right column → rightRename hint
    Seq((1, 5, "a")).toDF("ck", "id", "other")
      .pipe(df => store.applyChanges("rhs2", Seq("id"), df, Seq.empty[Int].toDF("id")))
    Seq((5, 2.0)).toDF("id", "amount")
      .pipe(df => store.applyChanges("lhs2", Seq("id"), df, Seq.empty[Int].toDF("id")))
    val collide = JoinViewDef("lhs2", Seq("id"), "rhs2", Seq("id"),
      Seq("id"), Seq("ck"), "v2", ViewDef(Seq("id"), Nil))
    val e2 = intercept[IllegalArgumentException](
      IncrementalJoinView.initialize(store, collide))
    assert(e2.getMessage.contains("rightRename"), e2.getMessage)

    // left_outer grouped by a right-side (nullable) column → rejected;
    // the same column where-guarded IS NOT NULL → accepted
    val badOuter = JoinViewDef("lhs", Seq("oid"), "rhs", Seq("custkey"),
      Seq("ck"), Seq("custkey"), "v3",
      ViewDef(Seq("region"), Nil), joinType = "left_outer",
      rightRename = Map("note" -> "rnote"))
    val e3 = intercept[IllegalArgumentException](
      IncrementalJoinView.initialize(store, badOuter))
    assert(e3.getMessage.contains("left_outer group keys"), e3.getMessage)
    val guarded = badOuter.copy(view = "v4", vdef =
      ViewDef(Seq("region"), Nil, where = Some("`region` IS NOT NULL")))
    IncrementalJoinView.initialize(store, guarded) // must not throw
  }

  test("min/max K-extreme buffers ride left-outer join views: " +
      "null-extended rows contribute nothing, and a drained buffer " +
      "rebuilds from the OUTER joined snapshot") {
    val store = freshStore()
    val mmDef = outerDef.copy(view = "mmview",
      vdef = ViewDef(Seq("region"), Seq("amount"),
        mins = Seq("amount"), maxs = Seq("amount"), bufK = 2))
    def assertMm(): Unit = {
      val o = store.read("ord") match {
        case Some(d) if d.columns.nonEmpty => d
        case _ => Seq.empty[(Int, Int, Double)].toDF("oid", "ck", "amount")
      }
      val joined = store.read("cust").get.join(
        o.withColumnRenamed("ck", "custkey"),
        Seq("custkey"), "left_outer")
      val exp = IncrementalView.compute(joined, mmDef.vdef)
        .selectExpr("region", "n", "try_element_at(minb_amount, 1)",
          "try_element_at(maxb_amount, 1)")
      val got = IncrementalJoinView.read(store, mmDef).get
        .selectExpr("region", "n", "min_amount", "max_amount")
      assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
        s"outer mm view drifted: ${got.collect().toSeq} vs " +
          s"${exp.collect().toSeq}")
    }
    // cust 2 (na) and 3 (eu) are orderless: their null-extended rows
    // count in n but contribute NOTHING to the buffers — eu's
    // min/max are NULL scalars (empty buffer head)
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "na"), (3, "eu")), cKeys())
    store.applyChanges("ord", Seq("oid"),
      orders((10, 1, 5.0), (11, 1, 2.0), (12, 1, 9.0)), oKeys())
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm()
    val eu = IncrementalJoinView.read(store, mmDef).get
      .filter(col("region") === "eu")
      .selectExpr("n", "min_amount IS NULL", "max_amount IS NULL")
      .as[(Long, Boolean, Boolean)].head()
    assert(eu == ((1L, true, true)), eu)

    // drain na's K=2 min buffer in one span (both kept minima die):
    // the per-group rebuild must recompute from the OUTER snapshot —
    // an inner rebuild would LOSE the null-extended rows' n mass
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(10, 11))
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm()
    val na = IncrementalJoinView.read(store, mmDef).get
      .filter(col("region") === "na")
      .selectExpr("n", "CAST(min_amount AS DOUBLE)",
        "CAST(max_amount AS DOUBLE)")
      .as[(Long, Double, Double)].head()
    assert(na == ((2L, 9.0, 9.0)), na) // cust1⋈order12 + cust2 NE row

    // and the LAST order dying flips na fully null-extended: buffers
    // empty again through the transition leg's retract/emit
    store.applyChanges("ord", Seq("oid"), orders(), oKeys(12))
    IncrementalJoinView.refreshToCurrent(store, mmDef)
    assertMm()
  }

  test("feedColumns prunes the union legs to groupBy ∪ aggregates ∪ " +
      "parsed where references; only unresolvable predicates keep the " +
      "full joined shape") {
    // simple single-part references resolve → pruned set
    assert(IncrementalJoinView.feedColumns(spark,
      ViewDef(Seq("region"), Seq("amount"), where = Some("oid % 2 = 0")))
      .map(_.toSet)
      .contains(Set("region", "amount", "oid", "_change_type")))
    // backticked references too
    assert(IncrementalJoinView.feedColumns(spark,
      ViewDef(Seq("g"), Nil, where = Some("`weird col` IS NOT NULL")))
      .map(_.toSet).contains(Set("g", "weird col", "_change_type")))
    // no predicate: aggregate set only (wide non-agg columns dropped)
    assert(IncrementalJoinView.feedColumns(spark,
      ViewDef(Seq("region"), Seq("amount"), mins = Seq("amount")))
      .map(_.toSet)
      .contains(Set("region", "amount", "_change_type")))
    // multi-part qualifier cannot be statically named → full shape
    assert(IncrementalJoinView.feedColumns(spark,
      ViewDef(Seq("g"), Nil, where = Some("t.c = 1"))).isEmpty)
    // unparseable text → full shape (the refresh still applies it and
    // fails THERE with Spark's own error, as before)
    assert(IncrementalJoinView.feedColumns(spark,
      ViewDef(Seq("g"), Nil, where = Some("NOT A ((( PREDICATE"))).isEmpty)
  }

  test("a wide joined shape with a where predicate maintains exactly " +
      "while the legs stay narrow (pruned-leg refresh correctness)") {
    val store = freshStore()
    // ord gains three WIDE payload columns no vdef term references
    val wideOrders = Seq(
      (10, 1, 5.0, "x" * 64, "y" * 64, 7L),
      (11, 1, 2.0, "x" * 64, "y" * 64, 8L),
      (12, 2, 3.0, "x" * 64, "y" * 64, 9L))
      .toDF("oid", "ck", "amount", "payload_a", "payload_b", "payload_c")
    store.applyChanges("ord", Seq("oid"), wideOrders, oKeys())
    store.applyChanges("cust", Seq("custkey"),
      custs((1, "na"), (2, "eu")), cKeys())
    val wdef = JoinViewDef(
      left = "ord", leftPks = Seq("oid"),
      right = "cust", rightPks = Seq("custkey"),
      leftKeys = Seq("ck"), rightKeys = Seq("custkey"),
      view = "wview",
      vdef = ViewDef(Seq("region"), Seq("amount"),
        where = Some("oid % 2 = 0")))
    IncrementalJoinView.initialize(store, wdef)
    // churn across the predicate boundary with payload churn too
    store.applyChanges("ord", Seq("oid"), Seq(
      (13, 2, 4.0, "z" * 64, "w" * 64, 1L),
      (14, 1, 6.0, "z" * 64, "w" * 64, 2L)).toDF(
      "oid", "ck", "amount", "payload_a", "payload_b", "payload_c"),
      oKeys(10))
    IncrementalJoinView.refreshToCurrent(store, wdef)
    val exp = store.read("ord").get
      .join(store.read("cust").get.withColumnRenamed("custkey", "ck"), "ck")
      .filter(expr("oid % 2 = 0"))
      .groupBy("region").agg(count(lit(1)).as("n"),
        sum(col("amount").cast("decimal(38,10)")).as("sum_amount"))
    val got = store.read("wview").get.select("region", "n", "sum_amount")
    assert(got.except(exp).isEmpty && exp.except(got).isEmpty,
      s"wide filtered join view drifted: ${got.collect().toSeq} vs " +
        s"${exp.collect().toSeq}")
  }

  // ------------------ riding MirrorPipeline ------------------

  private def esc(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeBatch(dir: java.nio.file.Path, n: Int,
      rows: Seq[(String, String, String, Int, Long)]): Unit = {
    val lines = rows.map { case (topic, key, value, part, off) =>
      val v = if (value == null) "null" else esc(value)
      s"""{"topic": ${esc(topic)}, "key": ${esc(key)}, "value": $v,""" +
        s""""partition": $part, "offset": $off}"""
    }
    java.nio.file.Files.write(dir.resolve(s"batch_$n.json"),
      lines.mkString("\n").getBytes)
  }

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

  // the reference's q13 shape live: customers ⟕ orders ON id =
  // purchaser (orders.id aliased aside), distinct products per last
  // name — zero-order customers included at nd = 0
  private val refOuter = JoinViewDef(
    left = "customers", leftPks = Seq("id"),
    right = "orders", rightPks = Seq("id"),
    leftKeys = Seq("id"), rightKeys = Seq("purchaser"),
    view = "prods_by_last",
    vdef = ViewDef(Seq("last_name"), Seq("quantity"),
      distincts = Seq("product")),
    joinType = "left_outer",
    rightRename = Map("id" -> "order_id"))

  test("customers ⟕ orders with COUNT(DISTINCT) rides MirrorPipeline " +
      "per micro-batch and survives a replay restart") {
    val in = Files.createTempDirectory("jod-in")
    val ckpt = Files.createTempDirectory("jod-ckpt")
    val storeRoot = "file:" + Files.createTempDirectory("jod-store")
    val catalog = CdcCatalog.fromPropertiesString(
      "pk.customers=id\npk.orders=id\n")
    val store = new ParquetTableStore(spark, storeRoot)

    writeBatch(in, 0, Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Walker", "g@x"), 1),
      Fixtures.raw(Fixtures.customer("r", 3, "Anne", "Kretchmar", "a@x"), 2),
      rawOrder(order("r", 100, 1, 3), 3),
      rawOrder(order("r", 101, 1, 5), 4),
      rawOrder(order("r", 102, 2, 7), 5)))
    val q = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot, Nil, ckpt.toString,
      joinViews = Seq(refOuter))
    try {
      q.processAllAvailable()
      assertExact(store, refOuter)
      // Kretchmar has no orders: present with nd 0 (the q13 zero class)
      assert(IncrementalJoinView.read(store, refOuter).get
        .filter(col("last_name") === "Kretchmar")
        .select("n", "nd_product").as[(Long, Long)].head() == ((1L, 0L)))

      // batch 2: Walker's only order moves to Thomas (Walker's match
      // count hits zero live), Kretchmar gains her first order
      writeBatch(in, 1, Seq(
        rawOrder(order("u", 102, 1, 7, before = Some((102, 2, 7))), 6),
        rawOrder(order("r", 103, 3, 2), 7)))
      q.processAllAvailable()
      assertExact(store, refOuter)
      val got = IncrementalJoinView.read(store, refOuter).get
        .select("last_name", "nd_product").as[(String, Long)]
        .collect().toMap
      assert(got == Map("Thomas" -> 3L, "Walker" -> 0L, "Kretchmar" -> 1L),
        got)
    } finally q.stop()

    // restart WITHOUT the checkpoint: both files replay — identical
    // merges net zero feeds and every cascade leg stays consistent
    val ckpt2 = Files.createTempDirectory("jod-ckpt2")
    val q2 = MirrorPipeline.start(
      CdcPipeline.fileSource(spark, in.toString), catalog,
      Envelope.defaultRegistry, storeRoot, Nil, ckpt2.toString,
      joinViews = Seq(refOuter))
    try {
      q2.processAllAvailable()
      assertExact(store, refOuter)
    } finally q2.stop()
  }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
