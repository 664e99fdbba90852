package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming point-in-time state: the stateful twin of q_state_at's
  * batch reconstruction (operators.PointInTime.stateAt). The batch
  * query filters history to ts ≤ T and keeps the last writer per key;
  * here the same state is maintained incrementally as the stream moves
  * past T — the state store keeps ONE record per key (its
  * latest-as-of-T event), so state size is O(keys), independent of
  * stream length, and the mirror's "what was every key's state at T?"
  * answer is available while the stream is still running.
  *
  * Unlike the other incremental twins, this operator needs NO
  * delivery-order contract: last-writer-wins is max by (seq, sub),
  * which is commutative and associative, so late/re-ordered/replayed
  * CDC events fold in correctly whenever they arrive — the natural
  * fit for an at-least-once CDC feed (re-delivery is idempotent:
  * max(s, e) twice is max(s, e)). A changed-state row is emitted in
  * exactly the batch where the key's as-of-T winner changes; the
  * current snapshot is the max-(seq, sub) row per key over the
  * emitted stream (IncrementalStateAtSpec folds exactly that and
  * pins equality against batch q_state_at).
  */
object IncrementalStateAt {

  /** One keyed observation; (seq, sub) = (unix micros, event_id). */
  final case class SEv(user_id: Long, seq: Long, sub: Long,
                       event_type: String, value: Double)

  /** Per-key winner as of T. Public top-level case class (Janino must
    * reach the constructor). */
  final case class Winner(seq: Long, sub: Long, event_type: String,
                          value: Double)

  /** An emitted state change: key's new as-of-T state. */
  final case class StateRow(user_id: Long, event_id: Long,
                            event_type: String, value: Double, seq: Long)

  def fromEvents(events: DataFrame): Dataset[SEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("event_type").as("event_type"),
      col("value").cast("double").as("value")).as[SEv]
  }

  /** Maintain each key's last-written state as of `tMicros` (unix
    * micros). Events with seq > T are absorbed without effect — the
    * stream keeps flowing past T, the answer stays pinned at T. */
  def stateAt(events: Dataset[SEv], tMicros: Long): Dataset[StateRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Winner, StateRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        def wins(b: Winner, a: Winner): Boolean =
          b.seq > a.seq || (b.seq == a.seq && b.sub > a.sub)
        val prev = state.getOption
        val batchBest = it.filter(_.seq <= tMicros)
          .foldLeft(Option.empty[Winner]) { (acc, e) =>
            val w = Winner(e.seq, e.sub, e.event_type, e.value)
            if (acc.exists(a => !wins(w, a))) acc else Some(w)
          }
        val next = (prev, batchBest) match {
          case (Some(a), Some(b)) => if (wins(b, a)) Some(b) else Some(a)
          case (a, b) => b.orElse(a)
        }
        next match {
          case Some(w) if !prev.contains(w) =>
            state.update(w)
            Iterator(StateRow(uid, w.sub, w.event_type, w.value, w.seq))
          case _ => Iterator.empty
        }
      }
  }
}
