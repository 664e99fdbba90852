package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming per-user transition mining: the stateful twin of
  * q_event_transitions' batch Markov matrix (operators.Coverage9).
  * The batch query pairs each event with its successor via lead();
  * here the pairing runs incrementally — the state store keeps ONE
  * record per user (the type of their latest event), so a transition
  * that straddles a micro-batch boundary is emitted exactly once, and
  * state size is O(users), independent of stream length.
  *
  * Ordering contract (same as IncrementalEwma): within a micro-batch
  * the group's events sort by (seq, sub); across batches the source
  * delivers each key's events in non-decreasing (seq, sub) order.
  * Under that contract the emitted multiset of (from, to) pairs is
  * IDENTICAL to the batch lead() pairing — IncrementalTransitionsSpec
  * pins count equality against q_event_transitions.
  */
object IncrementalTransitions {

  /** One keyed observation; (seq, sub) pin the order. */
  final case class TEv(user_id: Long, seq: Long, sub: Long, event_type: String)

  /** State: the latest event type seen for the user. Public top-level
    * case class (Janino must reach the constructor). */
  final case class LastType(event_type: String)

  /** One observed transition. */
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  def fromEvents(events: DataFrame): Dataset[TEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("event_type").as("event_type")).as[TEv]
  }

  /** Emit every (from → to) adjacent pair per user, incrementally.
    * Append semantics: each transition is produced exactly once, in the
    * batch where its successor event arrives.
    *
    * `evictAfterMs` (opt-in, the attribution/locf contract): a user
    * idle past the watermark by the TTL has their carried latest-type
    * evicted — bounded state under key churn; a reappearing user's
    * first event then opens no transition (cold restart). Requires an
    * upstream `withWatermark`. */
  def transitions(events: Dataset[TEv],
      evictAfterMs: Option[Long] = None): Dataset[Transition] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastType, Transition](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeout) { (uid, it, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
          if (batch.isEmpty) Iterator.empty
          else {
            val types = state.getOption.map(_.event_type).toIndexedSeq ++
              batch.map(_.event_type)
            state.update(LastType(types.last))
            if (state.exists) evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
            types.sliding(2).collect { case Seq(a, b) =>
              Transition(uid, a, b)
            }
          }
        }
      }
  }
}
