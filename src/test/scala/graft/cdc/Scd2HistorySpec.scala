package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.get_json_object
import org.scalatest.funsuite.AnyFunSuite

/** Scd2History must keep every version the Type-1 mirror overwrites:
  * updates close-and-open intervals, deletes close without opening,
  * re-creates start fresh, and only still-live keys have a current
  * row. Same fixture history as AsOfReplaySpec, so the two views of
  * the feed (as-of snapshot, full history) are pinned against the
  * same ground truth. */
class Scd2HistorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val catalog: CdcCatalog = CdcCatalog.fromPropertiesString(
    "pk.customers=id\nmap.customers=customers\n")

  private def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  // id=1 created t=1000, updated t=2000; id=2 created t=1500, deleted
  // t=2500; id=3 created t=3000 (AsOfReplaySpec's history)
  private val history = Seq(
    Fixtures.raw(Fixtures.customer("c", 1, "V1", "X", "v1@x", tsMs = 1000), 0),
    Fixtures.raw(Fixtures.customer("c", 2, "B1", "Y", "b1@y", tsMs = 1500),
      1, key = """{"id": 2}"""),
    Fixtures.raw(Fixtures.customer("u", 1, "V2", "X", "v2@x", tsMs = 2000), 2),
    Fixtures.raw(Fixtures.customer("d", 2, "B1", "Y", "b1@y",
      before = Some((2, "B1", "Y", "b1@y")), tsMs = 2500),
      3, key = """{"id": 2}"""),
    Fixtures.raw(Fixtures.customer("c", 3, "C1", "Z", "c1@z", tsMs = 3000),
      4, key = """{"id": 3}"""))

  test("full interval history: update closes, delete closes, create opens") {
    val got = Scd2History.history(toDf(history), catalog)
      .select($"key_json", $"valid_from_ms", $"valid_to_ms", $"is_current",
        get_json_object($"image", "$.first_name").as("fn"))
      .as[(String, Long, Option[Long], Boolean, String)]
      .collect().toSet
    val expect = Set(
      ("""{"id":"1"}""", 1000L, Some(2000L), false, "V1"),
      ("""{"id":"1"}""", 2000L, None, true, "V2"),
      ("""{"id":"2"}""", 1500L, Some(2500L), false, "B1"),
      ("""{"id":"3"}""", 3000L, None, true, "C1"))
    assert(got == expect)
  }

  test("re-create after delete starts a fresh current interval") {
    val recreated = history :+
      Fixtures.raw(Fixtures.customer("c", 2, "B2", "Y", "b2@y", tsMs = 4000),
        5, key = """{"id": 2}""")
    val got = Scd2History.history(toDf(recreated), catalog)
      .select($"key_json", $"valid_from_ms", $"valid_to_ms", $"is_current")
      .as[(String, Long, Option[Long], Boolean)].collect()
    val id2 = got.filter(_._1 == """{"id":"2"}""").sortBy(_._2)
    assert(id2.toSeq == Seq(
      ("""{"id":"2"}""", 1500L, Some(2500L), false),
      ("""{"id":"2"}""", 4000L, None, true)))
    // exactly one current version per still-live key
    val current = got.filter(_._4).map(_._1)
    assert(current.sorted.toSeq == current.distinct.sorted.toSeq)
  }

  test("empty / undecodable feed yields an empty history, not a crash") {
    val junk = Seq(
      ("mysql.app.customers", """{"id": 1}""", "not json at all {{{", 0, 0L),
      ("mysql.app.customers", null, null, 0, 1L)) // tombstone
      .toDF("topic", "key", "value", "partition", "offset")
    val got = Scd2History.history(junk, catalog)
    assert(got.schema == Scd2History.schema)
    assert(got.count() == 0)
  }

  test("materialized state at any T == the intervals covering T") {
    // cross-check vs the as-of materializer on the same feed: a key is
    // live at T iff exactly one history interval covers T
    val hist = Scd2History.history(toDf(history), catalog)
      .select($"key_json", $"valid_from_ms", $"valid_to_ms")
      .as[(String, Long, Option[Long])].collect()
    for (t <- Seq(1700L, 2600L, 3500L)) {
      val sink = new InMemorySink
      Materializer.applyBatch(toDf(history), catalog,
        Envelope.defaultRegistry, sink, asOfMs = Some(t))
      val liveKeys = sink.state("customers").keySet.map(k =>
        s"""{"id":"${k.head}"}""")
      val covered = hist.filter { case (_, from, to) =>
        from <= t && to.forall(_ > t)
      }.map(_._1).toSet
      assert(covered == liveKeys, s"at T=$t")
    }
  }
}
