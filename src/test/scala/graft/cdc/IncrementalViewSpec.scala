package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `IncrementalView` — CDF-driven materialized-view maintenance.
  * The invariant under test: after any chain of refreshes the view
  * equals `compute(current snapshot)` BIT-FOR-BIT (exact decimal
  * sums — no per-refresh drift), groups that empty out disappear,
  * and a refresh never reads the base table (only its change feed —
  * asserted by refreshing across versions whose diff is empty). */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import IncrementalView.ViewDef

  private val vdef = ViewDef(Seq("region"), Seq("amount"))

  // explicit file: URI — the whole IVM suite runs through the store's
  // Hadoop-FS code path (the exact route an hdfs://s3a:// root takes)
  private def freshStore() = new ParquetTableStore(spark,
    "file:" + java.nio.file.Files.createTempDirectory("graft-ivm"),
    nBuckets = 8)

  private def rows(t: (Int, String, Double)*): DataFrame =
    t.toDF("id", "region", "amount")

  private def keys(ids: Int*): DataFrame = ids.toDF("id")

  private def assertViewExact(store: ParquetTableStore): Unit = {
    val expected = IncrementalView.compute(store.read("base").get, vdef)
      .select("region", "n", "sum_amount")
    val got = store.read("view").get.select("region", "n", "sum_amount")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"view drifted:\ngot ${got.collect().toSeq}\n" +
        s"expected ${expected.collect().toSeq}")
  }

  test("insert/update/delete deltas keep the view equal to a recompute") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"),
      rows((1, "na", 10.5), (2, "na", 2.25), (3, "eu", 7.0)), keys())
    val v1 = IncrementalView.initialize(store, "base", "view", vdef)
    assertViewExact(store)

    // insert into eu, update 1 within na, MOVE 2 from na to eu, delete 3
    store.applyChanges("base", Seq("id"),
      rows((4, "eu", 1.75), (1, "na", 11.0), (2, "eu", 2.25)), keys(3))
    val v2 = store.versions("base").last
    val touched = IncrementalView.refresh(
      store, "base", Seq("id"), "view", vdef, v1, v2)
    assert(touched > 0)
    assertViewExact(store)

    // the moved row must have LEFT na's aggregate (pre-image applied)
    val na = store.read("view").get.filter(col("region") === "na")
      .select("n", "sum_amount").as[(Long, BigDecimal)].head()
    assert(na._1 == 1L && na._2 == BigDecimal("11.0000000000"))

    // empty out na entirely → its group row disappears
    store.applyChanges("base", Seq("id"), rows(), keys(1))
    val v3 = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, v2, v3)
    assertViewExact(store)
    assert(store.read("view").get.filter(col("region") === "na").isEmpty)

    // identical versions → empty diff → zero touched groups, view intact
    assert(IncrementalView.refresh(
      store, "base", Seq("id"), "view", vdef, v3, v3) == 0L)
    assertViewExact(store)
  }

  test("composes with the CDC pipeline: a mirror-fed view tracks upserts, " +
      "renames and deletes") {
    val store = freshStore()
    val catalog = CdcCatalog.fromPropertiesString(
      "pk.customers=id\nmap.customers=customers\n")
    def cdc(rows: Seq[(String, String, String, Int, Long)]): Unit =
      Materializer.applyBatch(
        rows.toDF("topic", "key", "value", "partition", "offset"),
        catalog, Envelope.defaultRegistry, store)
    val byLast = ViewDef(Seq("last_name"), Seq.empty)

    cdc(Seq(
      Fixtures.raw(Fixtures.customer("r", 1, "Sally", "Thomas", "s@x"), 0),
      Fixtures.raw(Fixtures.customer("r", 2, "George", "Thomas", "g@x"), 1),
      Fixtures.raw(Fixtures.customer("r", 3, "Ed", "Walker", "e@x"), 2)))
    var from = IncrementalView.initialize(store, "customers", "by_last", byLast)

    // update moves 2 Thomas→Walker; delete removes the last Walker-born
    cdc(Seq(
      Fixtures.raw(Fixtures.customer("u", 2, "George", "Walker", "g@x"), 3),
      Fixtures.raw(Fixtures.customer("d", 3, "Ed", "Walker", "e@x",
        before = Some((3, "Ed", "Walker", "e@x"))), 4)))
    val to = store.versions("customers").last
    IncrementalView.refresh(
      store, "customers", Seq("id"), "by_last", byLast, from, to)
    val counts = store.read("by_last").get
      .select("last_name", "n").as[(String, Long)].collect().toMap
    assert(counts == Map("Thomas" -> 1L, "Walker" -> 1L), counts)
    // and it equals a recompute of the mirror
    val expected = IncrementalView.compute(store.read("customers").get, byLast)
      .select("last_name", "n")
    val got = store.read("by_last").get.select("last_name", "n")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("crash between view merge and marker: the intent protocol " +
      "applies the interrupted refresh exactly once") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"),
      rows((1, "na", 1.0), (2, "eu", 2.0)), keys())
    val v1 = IncrementalView.initialize(store, "base", "view", vdef)
    store.applyChanges("base", Seq("id"), rows((3, "na", 3.0)), keys())
    val v2 = store.version("base").get

    // CASE A — crash AFTER the merge committed, BEFORE _REFLECTS:
    // simulate by running refresh() directly (merges, no marker) and
    // leaving the intent behind
    val viewBefore = store.version("view").getOrElse("")
    store.writeMarker("view", IncrementalView.IntentMarker,
      s"$v1\t$v2\t$viewBefore")
    IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, v1, v2)
    // recovery must fast-forward the marker WITHOUT re-applying
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", vdef)
    assertViewExact(store)
    assert(store.readMarker("view", IncrementalView.ReflectsMarker)
      .contains(v2))
    assert(store.readMarker("view", IncrementalView.IntentMarker).isEmpty)

    // CASE B — crash BEFORE the merge committed: a stale intent whose
    // viewBefore equals the CURRENT view version must be discarded and
    // the refresh run normally
    store.applyChanges("base", Seq("id"), rows((4, "eu", 4.0)), keys())
    val v3 = store.version("base").get
    store.writeMarker("view", IncrementalView.IntentMarker,
      s"$v2\t$v3\t${store.version("view").getOrElse("")}")
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", vdef)
    assertViewExact(store)
    assert(store.readMarker("view", IncrementalView.ReflectsMarker)
      .contains(v3))
  }

  test("a vacuumed marker version re-initializes the view, ghost groups " +
      "included") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"),
      rows((1, "na", 1.0), (2, "doomed", 9.0)), keys())
    IncrementalView.initialize(store, "base", "view", vdef)
    // four more versions; group 'doomed' vanishes entirely
    store.applyChanges("base", Seq("id"), rows((3, "na", 3.0)), keys(2))
    store.applyChanges("base", Seq("id"), rows((4, "eu", 4.0)), keys())
    store.applyChanges("base", Seq("id"), rows((5, "eu", 5.0)), keys())
    store.vacuum("base", keep = 2, minAgeMs = 0L)
    // the marker's version is gone (manifest AND change dir) — the
    // refresh must rebuild from the snapshot rather than crash, and
    // 'doomed' must not survive as a ghost row
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", vdef)
    assertViewExact(store)
    assert(store.read("view").get
      .filter(col("region") === "doomed").isEmpty)
    assert(store.readMarker("view", IncrementalView.ReflectsMarker) ==
      Some(store.version("base").get))
  }

  test("an emptied-out base initializes/rebuilds to an empty view " +
      "instead of failing the stream") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"),
      rows((1, "na", 1.0), (2, "eu", 2.0)), keys())
    IncrementalView.initialize(store, "base", "view", vdef)
    // delete EVERY row: the manifest keeps a live _LATEST pointer with
    // zero buckets — a legitimate state, not an error
    store.applyChanges("base", Seq("id"), rows(), keys(1, 2))
    // vacuum the marker's version away so refreshToCurrent must take
    // the re-initialize path (the one that used to throw)
    store.vacuum("base", keep = 1, minAgeMs = 0L)
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", vdef)
    assert(store.read("view").forall(_.isEmpty), "view kept ghost groups")
    assert(store.readMarker("view", IncrementalView.ReflectsMarker) ==
      Some(store.version("base").get))
    // and direct initialize on an empty base with NO existing view:
    // records the marker, materializes nothing, does not throw
    val at = IncrementalView.initialize(store, "base", "view2", vdef)
    assert(at == store.version("base").get)
    assert(store.read("view2").isEmpty)
  }

  // ---------------- MIN/MAX buffer maintenance ----------------

  private val mmDef = ViewDef(Seq("region"), Seq("amount"),
    mins = Seq("amount"), maxs = Seq("amount"), bufK = 3)

  /** Scalar min/max + n must equal a recompute; the stored buffers
    * must be PREFIXES of the recompute's full K-extreme buffers (they
    * may be shorter — that is the documented degradation mode). */
  private def assertMinMaxExact(store: ParquetTableStore): Unit = {
    val exp = IncrementalView.compute(store.read("base").get, mmDef)
      .select(col("region"), col("n"), col("sum_amount"),
        col("minb_amount"), col("maxb_amount"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2),
          r.getSeq[java.math.BigDecimal](3), r.getSeq[java.math.BigDecimal](4))))
      .toMap
    val got = store.read("view").get
      .select(col("region"), col("n"), col("sum_amount"),
        col("minb_amount"), col("maxb_amount"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2),
          r.getSeq[java.math.BigDecimal](3), r.getSeq[java.math.BigDecimal](4))))
      .toMap
    assert(got.keySet == exp.keySet, s"groups: $got vs $exp")
    got.foreach { case (g, (n, s, minb, maxb)) =>
      val (en, es, eminb, emaxb) = exp(g)
      assert(n == en && s == es, s"group $g: ($n,$s) != ($en,$es)")
      assert(minb.nonEmpty && maxb.nonEmpty, s"group $g drained in store")
      assert(eminb.startsWith(minb), s"group $g minb $minb !prefix $eminb")
      assert(emaxb.startsWith(maxb), s"group $g maxb $maxb !prefix $emaxb")
    }
  }

  test("min/max: extremum deletes splice the buffer, inserts respect the " +
      "prefix rule, no rebuild while the buffer holds") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"), rows(
      (1, "na", 1.0), (2, "na", 2.0), (3, "na", 3.0), (4, "na", 4.0),
      (5, "na", 5.0), (10, "eu", 10.0), (11, "eu", 20.0)), keys())
    var from = IncrementalView.initialize(store, "base", "view", mmDef)
    assertMinMaxExact(store)

    // delete the na minimum → one splice, buffer [2,3] (SHORTER than a
    // rebuild's [2,3,4] — proving the incremental path served it)
    store.applyChanges("base", Seq("id"), rows(), keys(1))
    var to = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", mmDef, from, to)
    from = to
    assertMinMaxExact(store)
    val naMinb = store.read("view").get.filter(col("region") === "na")
      .select("minb_amount").as[Seq[BigDecimal]].head()
    assert(naMinb == Seq(BigDecimal("2.0000000000"),
      BigDecimal("3.0000000000")), naMinb)

    // insert below the buffer head (admitted, becomes the new min) and
    // one above the short buffer's last (conservatively dropped)
    store.applyChanges("base", Seq("id"),
      rows((6, "na", 0.5), (7, "na", 3.5)), keys())
    to = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", mmDef, from, to)
    from = to
    assertMinMaxExact(store)
    val mins = IncrementalView.read(store, "view", mmDef).get
      .select("region", "min_amount", "max_amount")
      .as[(String, BigDecimal, BigDecimal)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mins("na") == ((BigDecimal("0.5000000000"),
      BigDecimal("5.0000000000"))), mins)
    assert(mins("eu") == ((BigDecimal("10.0000000000"),
      BigDecimal("20.0000000000"))), mins)
  }

  test("min/max: draining a buffer rebuilds ONLY that group from the " +
      "target snapshot") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"), rows(
      (1, "na", 1.0), (2, "na", 2.0), (3, "na", 3.0), (4, "na", 4.0),
      (5, "na", 5.0), (10, "eu", 10.0), (11, "eu", 20.0)), keys())
    val from = IncrementalView.initialize(store, "base", "view", mmDef)
    // delete the whole K=3 min buffer of na in ONE span → drain →
    // group rebuild must repopulate the buffer COMPLETELY ([4,5])
    store.applyChanges("base", Seq("id"), rows(), keys(1, 2, 3))
    val to = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", mmDef, from, to)
    assertMinMaxExact(store)
    val na = store.read("view").get.filter(col("region") === "na")
      .select("minb_amount").as[Seq[BigDecimal]].head()
    // a drained-then-spliced buffer would be empty; the rebuild serves
    // the full (group-sized, < K) prefix
    assert(na == Seq(BigDecimal("4.0000000000"),
      BigDecimal("5.0000000000")), na)
  }

  test("min/max: an update moving the extremum between groups splices " +
      "one side and admits on the other") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"), rows(
      (1, "na", 1.0), (2, "na", 2.0), (3, "na", 3.0), (4, "na", 4.0),
      (10, "eu", 10.0), (11, "eu", 20.0)), keys())
    val from = IncrementalView.initialize(store, "base", "view", mmDef)
    store.applyChanges("base", Seq("id"), rows((1, "eu", 1.0)), keys())
    val to = store.versions("base").last
    IncrementalView.refresh(store, "base", Seq("id"), "view", mmDef, from, to)
    assertMinMaxExact(store)
    val m = IncrementalView.read(store, "view", mmDef).get
      .select("region", "min_amount").as[(String, BigDecimal)]
      .collect().toMap
    assert(m("na") == BigDecimal("2.0000000000") &&
      m("eu") == BigDecimal("1.0000000000"), m)
  }

  test("min/max: 25 rounds of seeded random churn stay recompute-exact") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260814L)
    val regions = Array("na", "eu", "ap")
    var liveIds = Map.empty[Int, (String, Double)]
    var nextId = 1
    def randRows(k: Int): Seq[(Int, String, Double)] = (1 to k).map { _ =>
      val id = nextId; nextId += 1
      val r = (id, regions(rnd.nextInt(3)), (rnd.nextInt(400) + 1) / 4.0)
      liveIds += id -> ((r._2, r._3)); r
    }
    store.applyChanges("base", Seq("id"), rows(randRows(12): _*), keys())
    var from = IncrementalView.initialize(store, "base", "view", mmDef)
    (1 to 25).foreach { round =>
      // choose deletes and the update from PRE-round keys so one
      // applyChanges batch never carries a duplicate PK (insert+update
      // of the same id) or a same-batch insert+delete
      // (deletions biased toward the smallest live values so buffer
      // drains + rebuilds actually happen across the run)
      val dels = liveIds.toSeq.sortBy(_._2._2)
        .take(rnd.nextInt(4)).map(_._1)
      dels.foreach(liveIds -= _)
      val upd = liveIds.keys.toSeq.sorted.headOption.toSeq
        .filter(_ => rnd.nextBoolean()).map { id =>
          val moved = (id, regions(rnd.nextInt(3)), (rnd.nextInt(400) + 1) / 4.0)
          liveIds += id -> ((moved._2, moved._3)); moved
        }
      val ins = randRows(rnd.nextInt(4))
      store.applyChanges("base", Seq("id"),
        rows(ins ++ upd: _*), keys(dels: _*))
      val to = store.versions("base").last
      IncrementalView.refresh(store, "base", Seq("id"), "view", mmDef, from, to)
      from = to
      assertMinMaxExact(store)
    }
  }

  // ---------------- VAR/STDDEV from exact moments ----------------

  private val varDef = ViewDef(Seq("region"), Seq("amount"),
    vars = Seq("amount"))

  /** The second moment must equal a recompute BIT-FOR-BIT (it is a
    * signed decimal sum like sum_amount), and the derived var/stddev
    * must match VAR_SAMP/STDDEV_SAMP to float tolerance (the engines
    * differ only in summation order at the read edge). */
  private def assertVarExact(store: ParquetTableStore): Unit = {
    val expectedMoments = IncrementalView.compute(
      store.read("base").get, varDef)
      .select("region", "n", "sum_amount", "sum2_amount")
    val gotMoments = store.read("view").get
      .select("region", "n", "sum_amount", "sum2_amount")
    assert(gotMoments.except(expectedMoments).isEmpty &&
      expectedMoments.except(gotMoments).isEmpty,
      s"moments drifted:\ngot ${gotMoments.collect().toSeq}\n" +
        s"expected ${expectedMoments.collect().toSeq}")
    val exp = store.read("base").get.groupBy("region")
      .agg(var_samp(col("amount")).as("v"))
      .as[(String, Option[Double])].collect().toMap
    val got = IncrementalView.read(store, "view", varDef).get
      .select(col("region"), col("var_amount"))
      .as[(String, Option[Double])].collect().toMap
    assert(got.keySet == exp.keySet, s"groups: $got vs $exp")
    got.foreach { case (r, v) =>
      (v, exp(r)) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-8 * math.max(1.0, math.abs(b)),
            s"region $r: var $a vs var_samp $b")
        case (a, b) => assert(a == b, s"region $r: $a vs $b")
      }
    }
  }

  test("variance: maintained moments stay recompute-exact through " +
      "insert/update/delete churn; single-row groups read as null") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260816L)
    val regions = Array("na", "eu", "ap", "sa")
    var liveIds = Set.empty[Int]
    var nextId = 1
    def randRows(k: Int): Seq[(Int, String, Double)] = (1 to k).map { _ =>
      val id = nextId; nextId += 1; liveIds += id
      (id, regions(rnd.nextInt(4)), (rnd.nextInt(4000) + 1) / 4.0)
    }
    store.applyChanges("base", Seq("id"), rows(randRows(20): _*), keys())
    var from = IncrementalView.initialize(store, "base", "view", varDef)
    assertVarExact(store)
    (1 to 25).foreach { _ =>
      val dels = rnd.shuffle(liveIds.toSeq).take(rnd.nextInt(4))
      liveIds --= dels
      val upd = liveIds.toSeq.sorted.headOption.toSeq
        .filter(_ => rnd.nextBoolean())
        .map(id => (id, regions(rnd.nextInt(4)), (rnd.nextInt(4000) + 1) / 4.0))
      val ins = randRows(rnd.nextInt(4))
      store.applyChanges("base", Seq("id"),
        rows(ins ++ upd: _*), keys(dels: _*))
      val to = store.versions("base").last
      IncrementalView.refresh(store, "base", Seq("id"), "view", varDef,
        from, to)
      from = to
      assertVarExact(store)
    }
    // a group reduced to one row reads var as null, not zero or a crash
    val solo = store.read("base").get.filter(col("region") === "na")
      .select("id").as[Int].collect().toSeq
    if (solo.size > 1) {
      store.applyChanges("base", Seq("id"), rows(), keys(solo.drop(1): _*))
      val to = store.versions("base").last
      IncrementalView.refresh(store, "base", Seq("id"), "view", varDef,
        from, to)
      from = to
      assertVarExact(store)
    }
  }

  // ---------------- COUNT(DISTINCT) cascade ----------------

  private val ndvDef = ViewDef(Seq("region"), Seq.empty,
    distincts = Seq("amount"))

  /** n and nd_amount must equal a recompute (COUNT + COUNT(DISTINCT))
    * of the current base — including groups whose last occurrence of
    * a value was deleted this span. */
  private def assertDistinctExact(store: ParquetTableStore): Unit = {
    val exp = store.read("base").get.groupBy("region")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("amount")).as("nd"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val got = IncrementalView.read(store, "view", ndvDef).get
      .select(col("region"), col("n"), col("nd_amount"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == exp, s"\ngot      $got\nexpected $exp")
  }

  test("count-distinct: last-occurrence deletes decrement, duplicate " +
      "inserts don't inflate, value moves re-count per group") {
    val store = freshStore()
    // na: amounts {1.0 ×2, 2.0}; eu: {2.0}
    store.applyChanges("base", Seq("id"),
      rows((1, "na", 1.0), (2, "na", 1.0), (3, "na", 2.0), (4, "eu", 2.0)),
      keys())
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
    assertDistinctExact(store)

    // delete ONE of na's two 1.0 rows: nd must NOT move (occurrence
    // count 2 → 1); delete na's only 2.0: nd drops 2 → 1
    store.applyChanges("base", Seq("id"), rows(), keys(1, 3))
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
    assertDistinctExact(store)
    val na = IncrementalView.read(store, "view", ndvDef).get
      .filter(col("region") === "na").select("n", "nd_amount")
      .as[(Long, Long)].head()
    assert(na == ((1L, 1L)), na)

    // move eu's 2.0 to na as 3.0 (update changes BOTH group and value)
    store.applyChanges("base", Seq("id"), rows((4, "na", 3.0)), keys())
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
    assertDistinctExact(store)
    assert(IncrementalView.read(store, "view", ndvDef).get
      .filter(col("region") === "eu").isEmpty)

    // a replayed refresh is a no-op on every cascade leg
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
    assertDistinctExact(store)
  }

  test("count-distinct: 25 rounds of seeded churn stay recompute-exact, " +
      "including rounds that retire a group's last occurrence of a value") {
    val store = freshStore()
    val rnd = new scala.util.Random(20260815L)
    val regions = Array("na", "eu", "ap")
    // values drawn from a SMALL palette so occurrence counts > 1 are
    // common and last-occurrence retirement actually happens
    def pal() = (rnd.nextInt(6) + 1) / 2.0
    var live = Map.empty[Int, (String, Double)]
    var nextId = 1
    def ins(k: Int): Seq[(Int, String, Double)] = (1 to k).map { _ =>
      val id = nextId; nextId += 1
      val r = (id, regions(rnd.nextInt(3)), pal())
      live += id -> ((r._2, r._3)); r
    }
    store.applyChanges("base", Seq("id"), rows(ins(10): _*), keys())
    IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
    (1 to 25).foreach { round =>
      // deletions biased toward a value's LAST live occurrence: pick a
      // (region, amount) cell with exactly one row half the time
      val cells = live.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted)
      val lastOcc = cells.filter(_._2.size == 1).values.flatten.toSeq.sorted
      val dels = ((if (lastOcc.nonEmpty && rnd.nextBoolean())
          Seq(lastOcc(rnd.nextInt(lastOcc.size))) else Seq.empty) ++
        live.keys.toSeq.sorted.take(rnd.nextInt(3))).distinct
      dels.foreach(live -= _)
      val upd = live.keys.toSeq.sorted.headOption.toSeq
        .filter(_ => rnd.nextBoolean()).map { id =>
          val m = (id, regions(rnd.nextInt(3)), pal())
          live += id -> ((m._2, m._3)); m
        }
      store.applyChanges("base", Seq("id"),
        rows(ins(rnd.nextInt(3)) ++ upd: _*), keys(dels: _*))
      IncrementalView.refreshToCurrent(store, "base", Seq("id"), "view", ndvDef)
      assertDistinctExact(store)
    }
  }

  test("a long refresh chain stays bit-exact (no per-refresh drift)") {
    val store = freshStore()
    store.applyChanges("base", Seq("id"), rows((1, "na", 0.1)), keys())
    var from = IncrementalView.initialize(store, "base", "view", vdef)
    // 0.1 is the classic binary-noise value: double accumulation
    // over 30 refreshes would drift; decimal must not
    (2 to 30).foreach { i =>
      store.applyChanges("base", Seq("id"),
        rows((i, if (i % 2 == 0) "na" else "eu", 0.1)), keys())
      val to = store.versions("base").last
      IncrementalView.refresh(store, "base", Seq("id"), "view", vdef, from, to)
      from = to
    }
    assertViewExact(store)
    val sums = store.read("view").get
      .select("region", "sum_amount").as[(String, BigDecimal)]
      .collect().toMap
    // ids 1..30: the 16 even-or-1 ids land in na, the 14 odd in eu
    assert(sums("na") == BigDecimal("1.6000000000") &&
      sums("eu") == BigDecimal("1.4000000000"), sums)
    // derived mean surfaces as double only at the read edge
    val avg = IncrementalView.read(store, "view", vdef).get
      .filter(col("region") === "na").select("avg_amount").as[Double].head()
    assert(avg == 0.1)
  }
}
