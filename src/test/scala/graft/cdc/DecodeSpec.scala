package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class DecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  test("decodes create/read/update/delete ops with typed images") {
    val df = Decode.decode(toDf(Fixtures.goldenSequence), Envelope.customersRow)
    val ops = df.select("op").as[String].collect().sorted
    assert(ops.toSeq == Seq("c", "c", "d", "r", "r", "u"))
    val after3 = df.filter($"op" === "u").select("after.email").as[String].head()
    assert(after3 == "ed.walker@walker.com")
    val del = df.filter($"op" === "d").select("before.id").as[Int].head()
    assert(del == 2)
  }

  test("tombstones (null value) are dropped") {
    val df = Decode.decode(toDf(Fixtures.goldenSequence), Envelope.customersRow)
    assert(df.count() == 6) // 7 records minus 1 tombstone
  }

  test("payload wrapper accepted identically to root envelope") {
    val env = Fixtures.customer("c", 9, "A", "B", "a@b")
    val rows = Seq(Fixtures.raw(env, 0), Fixtures.raw(Fixtures.wrapped(env), 1))
    val df = Decode.decode(toDf(rows), Envelope.customersRow)
    val ids = df.select("after.id").as[Int].collect().toSeq
    assert(ids == Seq(9, 9))
  }

  test("corrupt JSON is isolated to rejects, not decoded, stream continues") {
    val rows = Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "A", "B", "a@b"), 0),
      Fixtures.raw("{not valid json!!", 1))
    assert(Decode.decode(toDf(rows), Envelope.customersRow).count() == 1)
    val rej = Decode.rejects(toDf(rows), Envelope.customersRow)
    assert(rej.count() == 1)
    assert(rej.select("corrupt").as[String].head().contains("not valid"))
  }

  test("unknown op is rejected (E2)") {
    val bad = Fixtures.customer("x", 5, "A", "B", "a@b")
    val rows = Seq(Fixtures.raw(bad, 0))
    assert(Decode.decode(toDf(rows), Envelope.customersRow).count() == 0)
    assert(Decode.rejects(toDf(rows), Envelope.customersRow).count() == 1)
  }

  test("table from source.table; topic last-segment fallback when absent") {
    val noSource =
      """{"before": null, "after": {"id": 1, "first_name": "A", "last_name": "B",
        |"email": "a@b", "created_at": "2026-01-28T00:00:00Z"}, "op": "c", "ts_ms": 1}"""
        .stripMargin.replaceAll("\n", " ")
    val rows = Seq(Fixtures.raw(noSource, 0, topic = "prefix.db1.customers"))
    val df = Decode.decode(toDf(rows), Envelope.customersRow)
    assert(df.select("table").as[String].head() == "customers")
  }

  test("dynamic fallback parses unknown tables as string maps") {
    val env =
      """{"before": null, "after": {"id": "7", "what": "ever"},
        |"source": {"db": "app", "table": "mystery", "ts_ms": 1},
        |"op": "c", "ts_ms": 1}""".stripMargin.replaceAll("\n", " ")
    val rows = Seq(Fixtures.raw(env, 0, topic = "mysql.app.mystery"))
    val df = Decode.decode(toDf(rows), Envelope.dynamicRowSchema)
    val after = df.select("after").as[Map[String, String]].head()
    assert(after == Map("id" -> "7", "what" -> "ever"))
  }
}
