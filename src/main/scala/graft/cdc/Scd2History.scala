package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD2 audit history over a change feed: every version a key ever had,
  * with its validity interval — the Type-2 dual of the reference's
  * Type-1 mirror (consumer/src/main/java/com/example/cdc/
  * DebeziumToPostgresConsumer.java:204-241 keeps only the latest row
  * per key; this keeps them all). Batch counterpart of
  * [[graft.streaming.IncrementalScd2]], over real Debezium envelopes.
  *
  * Semantics: versions order by (ts_ms, offset) per (db, table, PK);
  * a version's `valid_to_ms` is its successor's ts_ms — an update
  * closes-and-opens, a delete closes WITHOUT opening (the delete row
  * emits nothing itself; a later re-create starts a fresh interval).
  * `is_current` marks the open version of a still-live key. Events
  * with a null ts_ms drop (their position is unknowable — same policy
  * as `Materializer`'s asOf scoping).
  *
  * Scale: one dynamic-map decode (no shuffle), then ONE keyed window
  * per table partitioned by the same (db, table, PK) key the Type-1
  * sink merges on — parallel across keys at any history size; no
  * global sorts, no driver funneling beyond the bounded distinct
  * (db, table) listing (catalog-sized, the applyBatch precedent).
  */
object Scd2History {

  /** History of every table in the raw Kafka-shaped batch. PK columns
    * surface as `key_json` (ordered per catalog precedence); the row
    * image as `image` (JSON — audit view, not a typed mirror). */
  /** Output schema — also what an EMPTY feed (nothing decodable, or
    * all null-ts) returns, so CLI/composition callers never hit a
    * reduce-on-empty crash. */
  val schema: StructType = StructType(Seq(
    StructField("db", StringType), StructField("table", StringType),
    StructField("key_json", StringType),
    StructField("valid_from_ms", LongType),
    StructField("valid_to_ms", LongType),
    StructField("is_current", BooleanType, nullable = false),
    StructField("image", StringType)))

  def history(raw: DataFrame, catalog: CdcCatalog): DataFrame = {
    // loopInput (lazy localCheckpoint): the decoded feed is read once
    // per table branch PLUS once for the distinct listing — without it
    // the raw JSON re-parses (tables + 1) times (round-7 advice #3;
    // the same pattern every CC loop in DedupOps uses).
    val dec = graft.operators.DedupOps.loopInput(
      Decode.decode(raw, Envelope.dynamicRowSchema)
        .filter(col("ts_ms").isNotNull))
    val groups = dec.select("db", "table").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (groups.isEmpty)
      return raw.sparkSession.createDataFrame(
        raw.sparkSession.sparkContext.emptyRDD[Row], schema)
    val parts = groups.toSeq.map { case (db, tbl) =>
      val pks = catalog.pkFor(db, tbl)
      val d = dec.filter(col("db") === db && col("table") === tbl)
      val keyed = pks.foldLeft(d) { (df, p) =>
        df.withColumn(s"_k_$p",
          coalesce(col("after").getItem(p), col("before").getItem(p)))
      }
      val w = Window
        .partitionBy(col("db") +: col("table") +: pks.map(p => col(s"_k_$p")): _*)
        .orderBy(col("ts_ms"), col("offset"))
      keyed
        .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(w))
        .filter(col("op").isin(Envelope.UpsertOps: _*)
          && col("after").isNotNull)
        .select(
          col("db"), col("table"),
          to_json(struct(pks.map(p => col(s"_k_$p").as(p)): _*)).as("key_json"),
          col("ts_ms").as("valid_from_ms"),
          col("valid_to_ms"),
          col("valid_to_ms").isNull.as("is_current"),
          to_json(col("after")).as("image"))
    }
    parts.reduceLeft(_ unionByName _)
  }
}
