package graft.cdc

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Mid-stream schema drift, E2E over fixtures (round-6 verdict #6).
  *
  * The reference re-infers every field from JSON node kind per record
  * (DebeziumToPostgresConsumer.java:255-274), so an ADD COLUMN flows
  * through silently. The engine is schema-first; its DECLARED drift
  * policy, pinned here rather than left implicit:
  *
  *  - Registered table (schema known): PERMISSIVE-DROP. An envelope
  *    carrying an unknown extra field decodes cleanly — declared
  *    columns keep their values, the extra field is projected away,
  *    the row is NOT dead-lettered (it is valid JSON with a known op;
  *    the DLQ stays reserved for corrupt/unknown-op records). The new
  *    column starts materializing after the operator re-registers the
  *    widened schema — the schema registry is the upgrade point.
  *  - Unregistered table (SchemaInference path): WIDEN. The batch's
  *    sampled inference unions fields across records, so the new
  *    column appears with real types mid-stream and pre-drift rows
  *    decode with NULL for it — the reference's behavior, formalized
  *    per micro-batch instead of per record.
  */
class SchemaDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def toDf(rows: Seq[(String, String, String, Int, Long)]): DataFrame =
    rows.toDF("topic", "key", "value", "partition", "offset")

  /** customers envelope with an extra `loyalty_tier` column the
    * registered schema has never seen. */
  private def drifted(id: Int, email: String): String =
    s"""{"before": null, "after": {"id": $id, "first_name": "New",
       |"last_name": "Col", "email": "$email",
       |"created_at": "2026-01-28T00:00:00Z", "loyalty_tier": 3},
       |"source": {"db": "app", "table": "customers", "ts_ms": 1769558400000},
       |"op": "c", "ts_ms": 1769558400001}""".stripMargin.replaceAll("\n", " ")

  test("registered table: extra field PERMISSIVE-dropped, row decoded, DLQ empty") {
    val rows = Seq(
      Fixtures.raw(Fixtures.customer("c", 1, "A", "B", "a@b"), 0),
      Fixtures.raw(drifted(2, "drift@x"), 1))
    val dec = Decode.decode(toDf(rows), Envelope.customersRow)
    // both rows decode — drift is not an error
    assert(dec.count() == 2)
    assert(Decode.rejects(toDf(rows), Envelope.customersRow).count() == 0,
      "a drifted-but-valid envelope must not dead-letter")
    // declared columns keep their values; the unknown field is gone
    val r = dec.filter($"after.id" === 2)
    assert(r.select("after.email").as[String].head() == "drift@x")
    assert(!r.select("after.*").columns.contains("loyalty_tier"),
      "undeclared column must not leak into the typed image")
  }

  test("unregistered table: inference widens mid-stream, old rows get NULL") {
    val samples = Seq(
      Fixtures.customer("c", 1, "A", "B", "a@b"), // pre-drift
      drifted(2, "drift@x")) // post-drift
    val inferred = SchemaInference.inferRowSchema(spark, samples).get
    assert(inferred.fieldNames.contains("loyalty_tier"),
      s"widened schema missing new column: ${inferred.fieldNames.mkString(",")}")
    // decode the same mixed batch with the widened schema: the new
    // column is typed (long) and NULL on pre-drift rows
    val rows = samples.zipWithIndex.map { case (v, i) => Fixtures.raw(v, i.toLong) }
    val dec = Decode.decode(toDf(rows), inferred)
    val byId = dec.select($"after.id".cast("int"), $"after.loyalty_tier".cast("long"))
      .as[(Int, Option[Long])].collect().toMap
    assert(byId == Map(1 -> None, 2 -> Some(3L)))
  }
}
