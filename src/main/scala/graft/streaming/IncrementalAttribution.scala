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
    * non-purchase touch ("(none)" when there is none yet).
    *
    * `evictAfterMs` (opt-in) bounds state under unbounded key churn —
    * at 100 TB event streams users grow forever, and NoTimeout state
    * is O(all keys ever seen). With it set, a user whose last event is
    * older than the watermark by more than the TTL has their carried
    * touch EVICTED (event-time timeout; requires an upstream
    * `withWatermark` on the source). Documented contract: an evicted
    * user who reappears restarts COLD — their next purchase credits
    * "(none)" unless a fresh touch precedes it. Active keys (events
    * within the TTL) are emitted identically to the NoTimeout path. */
  def credits(events: Dataset[AEv],
      evictAfterMs: Option[Long] = None): Dataset[Credit] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Touch, Credit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeout) { (uid, it, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
          var touch = state.getOption.map(_.event_type).orNull
          val out = batch.flatMap { e =>
            if (e.event_type == "purchase")
              Some(Credit(uid, if (touch == null) "(none)" else touch, e.value))
            else { touch = e.event_type; None }
          }
          if (touch != null) state.update(Touch(touch))
          // the eviction clock is event time: TTL past the user's own
          // latest event (seq is µs; timeouts take ms)
          if (state.exists) evictAfterMs.foreach(ttl =>
            EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
          out.iterator
        }
      }
  }
}
