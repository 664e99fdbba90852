package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming last-touch attribution: the stateful twin of
  * q_attribution (operators.Coverage15). The batch query carries the
  * most recent preceding non-purchase touch per user with an IGNORE
  * NULLS window; here the carry lives in the state store — ONE record
  * per user (their latest non-purchase event type), so a purchase is
  * credited in the micro-batch it arrives, conversion dashboards read
  * the appended credits live, and state size is O(users), independent
  * of stream length.
  *
  * Ordering contract (the IncrementalEwma/Transitions family's):
  * within a micro-batch the group's events sort by (seq, sub); across
  * batches the source delivers each key's events in non-decreasing
  * (seq, sub) order. Under that contract the emitted credit multiset
  * is IDENTICAL to the batch window's —
  * IncrementalAttributionSpec pins aggregate equality against
  * q_attribution across micro-batch splits.
  */
object IncrementalAttribution {

  /** One keyed observation; (seq, sub) pin the order. */
  final case class AEv(user_id: Long, seq: Long, sub: Long,
      event_type: String, value: Double)

  /** State: the user's latest non-purchase touch (null until seen).
    * Public top-level case class (Janino must reach the constructor). */
  final case class Touch(event_type: String)

  /** One credited purchase. */
  final case class Credit(user_id: Long, touch: String, value: Double)

  def fromEvents(events: DataFrame): Dataset[AEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("event_type").as("event_type"),
      col("value").cast("double").as("value")).as[AEv]
  }

  /** Append one Credit per purchase, attributed to the latest earlier
    * non-purchase touch ("(none)" when there is none yet). */
  def credits(events: Dataset[AEv]): Dataset[Credit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Credit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
        var touch = state.getOption.map(_.event_type).orNull
        val out = batch.flatMap { e =>
          if (e.event_type == "purchase")
            Some(Credit(uid, if (touch == null) "(none)" else touch, e.value))
          else { touch = e.event_type; None }
        }
        if (touch != null) state.update(Touch(touch))
        out.iterator
      }
  }
}
