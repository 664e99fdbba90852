package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope decoding: Kafka-shaped records → typed change events.
  *
  * Implements, Spark-first, the per-record parse chain of the reference
  * consumer (/root/reference/consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java):
  *   F1 tombstone filter (:133-136), P1 JSON parse (:138), P2
  *   payload-or-root unwrap (:140), P3 field projection (:142-149),
  *   P4 topic-name fallback (:151-153,191-195), E1 per-record error
  *   isolation (:186-188), E2 unknown-op skip (:183-184).
  *
  * All of it is `from_json` + codegen'd column ops — one narrow
  * projection per record batch, no shuffle, fully parallel by Kafka
  * partition at any scale.
  */
object Decode {

  /** Expected columns of the raw source (what the Spark Kafka source
    * emits; the file-based test source mirrors it). */
  val rawSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType)))

  private val Corrupt = "_corrupt"

  /** Parse every non-tombstone record; corrupt/unknown rows keep a
    * non-null `corrupt` / bad `op` marker instead of killing the stream
    * (E1/E2: isolate-and-continue, never fail the batch). */
  def parse(raw: DataFrame, rowSchema: DataType): DataFrame = {
    val envelope = rowSchema match {
      case st: StructType => Envelope.wrapperSchema(st)
      case other => // dynamic fallback: map-typed row images
        StructType(Envelope.schema(StructType(Nil)).fields.map {
          case StructField("before", _, n, m) => StructField("before", other, n, m)
          case StructField("after", _, n, m) => StructField("after", other, n, m)
          case f => f
        }).add(StructField("payload", StructType(Seq(
          StructField("before", other), StructField("after", other),
          StructField("source", Envelope.sourceSchema),
          StructField("op", StringType), StructField("ts_ms", LongType)))))
    }
    val withCorrupt = envelope.add(StructField(Corrupt, StringType))

    raw
      // F1: Debezium post-delete tombstones carry a null/empty value.
      .filter(col("value").isNotNull && length(trim(col("value"))) > 0)
      .withColumn("_j", from_json(col("value").cast("string"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)))
      // P2: schemas-enabled wire format nests the envelope under
      // `payload`; schemas-disabled puts it at the root.
      .withColumn("_e", coalesce(col("_j.payload"), struct(
        col("_j.before").as("before"), col("_j.after").as("after"),
        col("_j.source").as("source"), col("_j.op").as("op"),
        col("_j.ts_ms").as("ts_ms"))))
      .select(
        col("topic"), col("key"), col("partition"), col("offset"),
        col("_e.op").as("op"),
        col("_e.before").as("before"),
        col("_e.after").as("after"),
        coalesce(col("_e.source.db"), lit("")).as("db"),
        // P4: prefer source.table, fall back to the last topic segment.
        coalesce(col("_e.source.table"),
          element_at(split(col("topic"), "\\."), -1)).as("table"),
        col("_e.ts_ms").as("ts_ms"),
        col(s"_j.$Corrupt").as("corrupt"))
  }

  /** Clean, applicable change events (known op, parse succeeded). */
  def decode(raw: DataFrame, rowSchema: DataType): DataFrame =
    parse(raw, rowSchema)
      .filter(col("corrupt").isNull && col("op").isin(Envelope.KnownOps: _*))
      .drop("corrupt")

  /** Dead-letter side: corrupt JSON or unknown/missing op (E1/E2).
    * Routed to a log/DLQ sink by the pipeline, never applied. */
  def rejects(raw: DataFrame, rowSchema: DataType): DataFrame =
    parse(raw, rowSchema)
      .filter(col("corrupt").isNotNull
        || col("op").isNull || !col("op").isin(Envelope.KnownOps: _*))
}
