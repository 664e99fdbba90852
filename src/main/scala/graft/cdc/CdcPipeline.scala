package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** End-to-end CDC pipeline wiring: source → foreachBatch(materialize).
  *
  * The reference's consume loop (poll → per-record process,
  * /root/reference/consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java:117-128)
  * becomes a Structured Streaming query: the Kafka source replaces the
  * hand-built consumer (subscribePattern = the reference's topics.regex,
  * /root/reference/consumer/src/main/resources/config.properties:6),
  * checkpointing replaces Kafka auto-commit (same at-least-once +
  * idempotent-sink contract, §2-A C1), and Trigger.ProcessingTime
  * replaces the 1 s poll.
  */
object CdcPipeline {

  /** Kafka source shaped like Decode.rawSchema. No compile-time Kafka
    * dependency — the connector is resolved by name at runtime. */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      subscribePattern: String,
      startingOffsets: String = "earliest"): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribePattern", subscribePattern)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("topic"),
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("partition"),
        col("offset"))
  }

  /** File-based source with the same shape (JSON lines of
    * topic/key/value/partition/offset) — stands in for Kafka in tests
    * and local replays; identical downstream pipeline. */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Decode.rawSchema).json(dir)

  /** Start the materialization stream into `sink`; undecodable records
    * land in `dlqDir` (JSON, per table) when given. */
  def start(raw: DataFrame, catalog: CdcCatalog,
      registry: Map[String, StructType], sink: CdcSink,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      dlqDir: Option[String] = None,
      asOfMs: Option[Long] = None): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Materializer.applyBatch(batch, catalog, registry, sink, dlqDir,
          asOfMs = asOfMs)
      }
      .start()
}
