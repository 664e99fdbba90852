package graft.cdc

import org.apache.spark.sql.types._

/** Debezium change-event envelope model (wire format with JSON-converter
  * schemas disabled, so the envelope sits at the JSON root; a `payload`
  * wrapper must also be accepted).
  *
  * Reference: envelope unwrap + field projection in
  * /root/reference/consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java:138-149,
  * wire config /root/reference/connectors/mysql-source.json:28-31.
  */
object Envelope {

  /** op codes the engine applies; everything else is warned + skipped
    * (reference :183-184). `r` (snapshot read) is treated as upsert like
    * `c` (reference :175-178). */
  val UpsertOps: Seq[String] = Seq("c", "r", "u")
  val DeleteOp = "d"
  val KnownOps: Seq[String] = UpsertOps :+ DeleteOp

  def sourceSchema: StructType = StructType(Seq(
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("ts_ms", LongType)))

  /** Envelope for a known per-table row schema. */
  def schema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Envelope-or-payload wrapper: the same envelope nested under
    * `payload` (schemas-enabled converters) or at the root. */
  def wrapperSchema(row: StructType): StructType =
    schema(row).add(StructField("payload", schema(row)))

  /** Dynamic fallback for tables with no registered schema: row images
    * parsed as string→string maps (mirrors the reference's schemaless
    * per-field coercion, consumer :255-274, without inventing types). */
  def dynamicRowSchema: MapType = MapType(StringType, StringType)

  /** Source table schemas of the reference deployment
    * (/root/reference/mysql/init/01_setup.sql:13-28). Type policy per
    * /root/reference/connectors/mysql-source.json:25-26: DECIMAL→double,
    * TIMESTAMP→ISO-8601 string at the boundary. */
  val customersRow: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("created_at", StringType)))

  val ordersRow: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("order_date", StringType),
    StructField("purchaser", IntegerType),
    StructField("quantity", IntegerType),
    StructField("product", StringType)))

  /** Default schema registry keyed by source table name. */
  val defaultRegistry: Map[String, StructType] = Map(
    "customers" -> customersRow,
    "orders" -> ordersRow)
}
