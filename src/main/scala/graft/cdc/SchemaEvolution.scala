package graft.cdc

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Opt-in registry evolution for schema drift (round-7 verdict #6).
  *
  * The engine's DEFAULT drift policy for registered tables is
  * PERMISSIVE-DROP (SchemaDriftSpec pins it): an envelope carrying an
  * unknown column still decodes, the column is projected away, and the
  * registry is the manual upgrade point. This class is the automated
  * alternative: an unknown column observed in `confirmBatches`
  * CONSECUTIVE clean micro-batches — same name, same inferred type,
  * no dead-lettered rows in the batch — widens the registered
  * StructType with the new column (nullable), and every subsequent
  * batch decodes it with real types. Pre-widening rows simply carry
  * NULL, exactly like the unregistered-table inference path.
  *
  * The confirmation window is the safety argument: the reference
  * re-infers per record (DebeziumToPostgresConsumer.java:255-274), so
  * ONE malformed producer deploy could flip a column's type downstream;
  * requiring N consecutive clean sightings with a STABLE inferred type
  * means a transient bad publish resets the counter instead of
  * widening the registry. Dirty batches (any DLQ row) also reset —
  * drift confirmation must come from batches the engine fully trusts.
  *
  * Driver-side state is O(tables × drifting columns) — a handful of
  * counters, held by whoever owns the foreachBatch loop; this is
  * coordinator metadata, not data-plane state, so it does not grow
  * with stream volume.
  */
final class SchemaEvolution(initial: Map[String, StructType],
    confirmBatches: Int = 2) {
  require(confirmBatches >= 1, "confirmBatches must be >= 1")

  private val registry = TrieMap[String, StructType](initial.toSeq: _*)
  // (table, column) -> (stable inferred type, consecutive clean sightings)
  private val sightings = TrieMap.empty[(String, String), (DataType, Int)]

  /** The schema to decode `table` with right now. */
  def schemaFor(table: String): Option[StructType] = registry.get(table)

  /** Columns widened into `table`'s schema so far (audit surface). */
  def widened(table: String): Seq[String] =
    registry.get(table).map(_.fieldNames.toSeq).getOrElse(Nil)
      .diff(initial.get(table).map(_.fieldNames.toSeq).getOrElse(Nil))

  /** Observe one table's raw envelope micro-batch and advance the
    * drift counters; returns the (possibly just-widened) schema to use
    * for the NEXT batch. Call once per (table, micro-batch), BEFORE or
    * AFTER decoding — widening only ever applies to later batches, so
    * the current batch's decode stays deterministic either way. */
  def observe(spark: SparkSession, table: String, sub: DataFrame): StructType = {
    val current = registry.getOrElse(table,
      throw new IllegalArgumentException(s"unregistered table: $table"))
    val inferred = SchemaInference.inferRowSchema(
      spark, SchemaInference.sampleValues(sub))
    val clean = Decode.rejects(sub, current).isEmpty
    val unknownNow: Map[String, DataType] = inferred match {
      case Some(inf) if clean =>
        inf.fields.filterNot(f => current.fieldNames.contains(f.name))
          .map(f => f.name -> f.dataType).toMap
      case _ => Map.empty // dirty or unparseable batch confirms nothing
    }
    // columns absent this batch (or whole batch dirty) reset; a type
    // flip restarts confirmation at 1 for the NEW type
    sightings.keys.filter(_._1 == table).foreach { k =>
      if (!unknownNow.contains(k._2)) sightings.remove(k)
    }
    unknownNow.foreach { case (name, dt) =>
      val n = sightings.get((table, name)) match {
        case Some((prev, c)) if prev == dt => c + 1
        case _ => 1
      }
      if (n >= confirmBatches) {
        registry.put(table,
          StructType(registry(table).fields :+ StructField(name, dt, nullable = true)))
        sightings.remove((table, name))
      } else sightings.put((table, name), (dt, n))
    }
    registry(table)
  }
}
