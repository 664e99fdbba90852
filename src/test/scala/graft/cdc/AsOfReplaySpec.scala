package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Time-travel replay (the CDC dual of q_state_at): applying a change
  * history with `asOfMs = T` must rebuild exactly the state the mirror
  * had at T — later updates and deletes invisible, null-ts events
  * dropped — while the unscoped replay of the same batch yields the
  * final image. */
class AsOfReplaySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val catalog: CdcCatalog = CdcCatalog.fromPropertiesString(
    "pk.customers=id\nmap.customers=customers\n")

  private def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  // history: id=1 created at t=1000, updated at t=2000; id=2 created
  // at t=1500, deleted at t=2500; id=3 created at t=3000
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

  test("asOf mid-history shows the old update target and pre-delete row") {
    val sink = new InMemorySink
    Materializer.applyBatch(toDf(history), catalog,
      Envelope.defaultRegistry, sink, asOfMs = Some(1700L))
    val st = sink.state("customers")
    assert(st.keySet == Set(Seq(1), Seq(2)), "id=3 not yet created at T")
    assert(st(Seq(1))("first_name") == "V1", "update at t=2000 is after T")
    assert(st(Seq(2))("first_name") == "B1", "delete at t=2500 is after T")
  }

  test("asOf after the delete excludes the deleted key") {
    val sink = new InMemorySink
    Materializer.applyBatch(toDf(history), catalog,
      Envelope.defaultRegistry, sink, asOfMs = Some(2600L))
    val st = sink.state("customers")
    assert(st.keySet == Set(Seq(1)))
    assert(st(Seq(1))("first_name") == "V2")
  }

  test("unscoped replay of the same history yields the final image") {
    val sink = new InMemorySink
    Materializer.applyBatch(toDf(history), catalog,
      Envelope.defaultRegistry, sink)
    val st = sink.state("customers")
    assert(st.keySet == Set(Seq(1), Seq(3)))
    assert(st(Seq(1))("first_name") == "V2")
  }

  test("asOf before all history is an empty mirror") {
    val sink = new InMemorySink
    Materializer.applyBatch(toDf(history), catalog,
      Envelope.defaultRegistry, sink, asOfMs = Some(500L))
    assert(sink.state("customers").isEmpty)
  }
}
