package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in registry evolution (round-7 verdict #6): an unknown column
  * confirmed over N consecutive clean batches widens the registered
  * schema; dirty batches, gaps, and type flips reset confirmation.
  * Decode behavior is pinned pre AND post widening.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  private def drifted(id: Int, tier: Long): String =
    s"""{"before": null, "after": {"id": $id, "first_name": "N",
       |"last_name": "C", "email": "e$id@x",
       |"created_at": "2026-01-28T00:00:00Z", "loyalty_tier": $tier},
       |"source": {"db": "app", "table": "customers", "ts_ms": 1769558400000},
       |"op": "c", "ts_ms": 1769558400001}""".stripMargin.replaceAll("\n", " ")

  private def driftedStr(id: Int): String =
    s"""{"before": null, "after": {"id": $id, "first_name": "N",
       |"last_name": "C", "email": "e$id@x",
       |"created_at": "2026-01-28T00:00:00Z", "loyalty_tier": "gold"},
       |"source": {"db": "app", "table": "customers", "ts_ms": 1769558400000},
       |"op": "c", "ts_ms": 1769558400001}""".stripMargin.replaceAll("\n", " ")

  private def cleanBatch(ids: Int*): DataFrame =
    toDf(ids.map(i => Fixtures.raw(drifted(i, i * 10L), i.toLong)))

  test("unknown column widens after N consecutive clean batches, decodes with NULL history") {
    val ev = new SchemaEvolution(Envelope.defaultRegistry, confirmBatches = 2)

    // batch 1: drift observed once — NOT yet widened; decode drops it
    val s1 = ev.observe(spark, "customers", cleanBatch(1, 2))
    assert(!s1.fieldNames.contains("loyalty_tier"))
    val d1 = Decode.decode(cleanBatch(1, 2), s1)
    assert(d1.count() == 2 && !d1.select("after.*").columns.contains("loyalty_tier"))

    // batch 2: second consecutive clean sighting — registry widens
    val s2 = ev.observe(spark, "customers", cleanBatch(3, 4))
    assert(s2.fieldNames.contains("loyalty_tier"))
    assert(s2.fields.find(_.name == "loyalty_tier").get.dataType == LongType)
    assert(s2.fields.find(_.name == "loyalty_tier").get.nullable)
    assert(ev.widened("customers") == Seq("loyalty_tier"))

    // post-widening decode: new column typed; pre-drift rows carry NULL
    val mixed = toDf(Seq(
      Fixtures.raw(Fixtures.customer("c", 9, "A", "B", "a@b"), 0), // pre-drift
      Fixtures.raw(drifted(10, 70L), 1)))
    val dec = Decode.decode(mixed, ev.schemaFor("customers").get)
    val byId = dec.select($"after.id".cast("int"), $"after.loyalty_tier".cast("long"))
      .as[(Int, Option[Long])].collect().toMap
    assert(byId == Map(9 -> None, 10 -> Some(70L)))
  }

  test("a dirty batch resets confirmation") {
    val ev = new SchemaEvolution(Envelope.defaultRegistry, confirmBatches = 2)
    ev.observe(spark, "customers", cleanBatch(1))
    // same drift but the batch carries a corrupt record → no confirmation
    val dirty = toDf(Seq(
      Fixtures.raw(drifted(2, 20L), 0),
      Fixtures.raw("{not json", 1)))
    assert(!ev.observe(spark, "customers", dirty).fieldNames.contains("loyalty_tier"))
    // one clean sighting after the reset is still not enough
    assert(!ev.observe(spark, "customers", cleanBatch(3))
      .fieldNames.contains("loyalty_tier"))
    // the second consecutive clean one is
    assert(ev.observe(spark, "customers", cleanBatch(4))
      .fieldNames.contains("loyalty_tier"))
  }

  test("a type flip restarts confirmation for the new type") {
    val ev = new SchemaEvolution(Envelope.defaultRegistry, confirmBatches = 2)
    ev.observe(spark, "customers", cleanBatch(1)) // long, sighting 1
    val asString = toDf(Seq(Fixtures.raw(driftedStr(2), 0)))
    // string sighting does not stack on the long one
    assert(!ev.observe(spark, "customers", asString)
      .fieldNames.contains("loyalty_tier"))
    // second consecutive STRING sighting widens as string
    val s = ev.observe(spark, "customers",
      toDf(Seq(Fixtures.raw(driftedStr(3), 0))))
    assert(s.fields.find(_.name == "loyalty_tier").get.dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("a batch without the column resets confirmation") {
    val ev = new SchemaEvolution(Envelope.defaultRegistry, confirmBatches = 2)
    ev.observe(spark, "customers", cleanBatch(1))
    val plain = toDf(Seq(
      Fixtures.raw(Fixtures.customer("c", 2, "A", "B", "a@b"), 0)))
    ev.observe(spark, "customers", plain) // drift absent → reset
    assert(!ev.observe(spark, "customers", cleanBatch(3))
      .fieldNames.contains("loyalty_tier"), "gap must reset the counter")
  }
}
