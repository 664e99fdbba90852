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

  private def freshStore() = new ParquetTableStore(spark,
    java.nio.file.Files.createTempDirectory("graft-ivm").toString,
    nBuckets = 8)

  private def rows(t: (Int, String, Double)*): DataFrame =
    t.toDF("id", "region", "amount")

  private def keys(ids: Int*): DataFrame = ids.toDF("id")

  private def assertViewExact(store: ParquetTableStore): Unit = {
    val expected = IncrementalView.compute(store.read("base").get, vdef)
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
    store.vacuum("base", keep = 2)
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
