package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming SCD2 (slowly-changing-dimension type 2) maintenance: the
  * stateful twin of the batch q_scd2 interval builder (operators
  * .Temporal) and the classic CDC-consumer materialization the
  * reference's UPSERT sink overwrites away (reference:
  * consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer
  * .java:204-241 keeps only the latest row per key; SCD2 keeps every
  * version with its validity interval).
  *
  * The state store holds ONE open version per key (O(keys), independent
  * of stream length). When a key's next event arrives, the open version
  * closes — `valid_to` = the successor's `valid_from` — and is emitted
  * exactly once (append semantics), even when the succession straddles a
  * micro-batch boundary. The still-open version stays in state: a batch
  * rebuild over the emitted CLOSED rows plus the state's open rows
  * reproduces q_scd2 exactly, which IncrementalScd2Spec pins (closed
  * rows against q_scd2's non-null valid_to rows; open-row count = one
  * per key).
  *
  * Ordering contract (same as IncrementalEwma/Transitions): within a
  * micro-batch the group's events sort by (seq, sub); across batches the
  * source delivers each key's events in non-decreasing (seq, sub) order.
  */
object IncrementalScd2 {

  /** One keyed observation; (seq, sub) = (µs timestamp, event id). */
  final case class SEv(user_id: Long, seq: Long, sub: Long,
                       event_type: String, value: Double)

  /** State: the key's open (current) version. Public top-level case
    * class (Janino must reach the constructor). */
  final case class OpenVersion(seq: Long, sub: Long, event_type: String,
                               value: Double)

  /** One CLOSED dimension version (valid_to always set — open versions
    * live in state until their successor arrives). */
  final case class ClosedVersion(user_id: Long, valid_from_us: Long,
                                 valid_to_us: Long, event_type: String,
                                 value: Double)

  def fromEvents(events: DataFrame): Dataset[SEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("event_type").as("event_type"),
      col("value").cast("double").as("value")).as[SEv]
  }

  /** Emit every closed version per key, incrementally, exactly once. */
  def closedVersions(events: Dataset[SEv]): Dataset[ClosedVersion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenVersion, ClosedVersion](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
        if (batch.isEmpty) Iterator.empty
        else {
          val versions = state.getOption.map(o =>
            SEv(uid, o.seq, o.sub, o.event_type, o.value)).toIndexedSeq ++ batch
          val last = versions.last
          state.update(OpenVersion(last.seq, last.sub, last.event_type,
            last.value))
          versions.sliding(2).collect { case Seq(a, b) =>
            ClosedVersion(uid, a.seq, b.seq, a.event_type, a.value)
          }
        }
      }
  }
}
