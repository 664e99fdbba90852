package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Micro-batch materialization: route → compact (last writer wins per
  * key) → split upserts/deletes → sink.
  *
  * The reference gets ordering for free from single-threaded consumption
  * of one partition (SURVEY.md §2-A C2); Spark processes a whole
  * micro-batch at once, so last-writer-wins must be made explicit: a
  * max_by(offset) aggregation per (db, table, pk). Debezium keys
  * records by PK, so a key is sticky to one Kafka partition and offset
  * order IS the key's change order — the compaction is exact, not
  * heuristic, and it shuffles each batch once by the same key the sink
  * merges on.
  */
object Materializer {

  /** Keep only the latest change per key within a batch (M1's dedup
    * prerequisite). PK values come from `after`, falling back to
    * `before` for deletes.
    *
    * Implemented as a max_by aggregation, not a row_number window: an
    * aggregation gets map-side partial combine, so duplicate keys
    * collapse before the shuffle and nothing is sorted — on a
    * 1M-record batch this is the difference between shuffling the
    * whole batch and shuffling one row per key. Offsets are unique
    * per partition (Kafka), so max_by is deterministic. */
  def lastPerKey(decoded: DataFrame, pks: Seq[String]): DataFrame = {
    // getItem resolves on both struct images (registered schemas) and
    // map images (dynamic fallback)
    val keyed = pks.foldLeft(decoded) { (df, p) =>
      df.withColumn(s"_k_$p",
        coalesce(col("after").getItem(p), col("before").getItem(p)))
    }
    val payload = struct(decoded.columns.toIndexedSeq.map(col): _*)
    keyed
      .groupBy(col("db") +: col("table") +: pks.map(p => col(s"_k_$p")): _*)
      .agg(max_by(payload, col("offset")).as("_r"))
      .select(col("_r.*"))
  }

  /** Apply one raw micro-batch: per topic-table, parse with its
    * registered schema (dynamic map fallback otherwise), then per
    * (db, table) group resolve PKs/target and apply compacted changes.
    * Records that fail decoding (corrupt JSON / unknown op) are
    * appended to `dlqDir` when given (E1: isolate, never fail the
    * stream, never silently lose the record either).
    *
    * `asOfMs`: time-travel replay (the CDC dual of q_state_at /
    * PointInTime.stateAt) — only decoded events with envelope
    * `ts_ms <= asOfMs` apply, so a replay over retained history
    * rebuilds the mirror AS OF that instant. Events with a null ts_ms
    * are dropped under as-of scoping (their position relative to T is
    * unknowable); the DLQ is NOT time-scoped (a parse failure is a
    * parse failure whenever it happened).
    */
  def applyBatch(batch: DataFrame, catalog: CdcCatalog,
      registry: Map[String, StructType], sink: CdcSink,
      dlqDir: Option[String] = None,
      inferUnknown: Boolean = true,
      asOfMs: Option[Long] = None): Unit = {
    if (batch.isEmpty) return
    val withTable = batch
      .withColumn("_topic_table", element_at(split(col("topic"), "\\."), -1))
    // Distinct topic-tables: bounded by the catalog size, not data size.
    val topicTables = withTable.select("_topic_table").distinct()
      .collect().map(_.getString(0))

    topicTables.foreach { tt =>
      val sub = withTable.filter(col("_topic_table") === tt).drop("_topic_table")
      val rowSchema = registry.getOrElse(tt,
        if (inferUnknown)
          SchemaInference.inferRowSchema(batch.sparkSession,
            SchemaInference.sampleValues(sub))
            .getOrElse(Envelope.dynamicRowSchema)
        else Envelope.dynamicRowSchema)
      dlqDir.foreach { d =>
        Decode.rejects(sub, rowSchema)
          .select(col("topic"), col("key"), col("partition"), col("offset"),
            col("op"), col("corrupt"))
          .write.mode("append").json(s"$d/$tt")
      }
      val decodedAll = Decode.decode(sub, rowSchema)
      val decoded = asOfMs.fold(decodedAll)(t =>
        decodedAll.filter(col("ts_ms").isNotNull && col("ts_ms") <= t)).cache()
      try {
        val groups = decoded.select("db", "table").distinct().collect()
          .map(r => (r.getString(0), r.getString(1)))
        groups.foreach { case (db, tbl) =>
          val pks = catalog.pkFor(db, tbl)
          val target = catalog.targetFor(db, tbl)
          val g = lastPerKey(decoded.filter(col("db") === db && col("table") === tbl), pks)
          // M1: ops c/r/u with a non-null after-image upsert…
          val isStruct = rowSchema.isInstanceOf[StructType]
          val ups = g
            .filter(col("op").isin(Envelope.UpsertOps: _*) && col("after").isNotNull)
          val upserts =
            if (isStruct) ups.select(col("after.*"))
            // dynamic map image: PKs extracted as columns + the raw map
            else ups.select(pks.map(p => col("after").getItem(p).as(p))
              :+ col("after"): _*)
          // …M3: op d with a non-null before-image deletes by PK.
          val deleteKeys = g
            .filter(col("op") === Envelope.DeleteOp && col("before").isNotNull)
            .select(pks.map(p => col("before").getItem(p).as(p)): _*)
          sink.applyChanges(target, pks, upserts, deleteKeys)
        }
      } finally decoded.unpersist()
    }
  }
}
