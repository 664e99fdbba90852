package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming sessionization: the stateful twin of q_sessionize
  * (operators.Temporal). The batch query builds 30-minute-gap sessions
  * with `session_window`; here the OPEN session lives in the state
  * store — one record per active user — and a session is emitted
  * exactly once, CLOSED, either when a later event of the same user
  * arrives past the gap (in-batch or cross-batch) or when the
  * event-time watermark passes the session's end by the gap
  * (EventTimeTimeout — the idle path; an upstream `withWatermark` is
  * therefore REQUIRED). State is O(active users), independent of
  * stream length — eviction is not opt-in here because the timeout IS
  * the operator's emission trigger, not a memory knob.
  *
  * Ordering contract (the IncrementalEwma/Attribution family's):
  * within a micro-batch a user's events sort by (seq, sub); across
  * batches the source delivers each key's events in non-decreasing
  * (seq, sub) order. Under it the emitted closed sessions equal the
  * batch `session_window` aggregation row-for-row
  * (IncrementalSessionizeSpec pins equality over the events table).
  * Late data: an event older than the WATERMARK is dropped by the
  * engine before this function runs (standard EventTimeTimeout
  * late-data semantics — it cannot reopen anything); an
  * out-of-contract event that is within the watermark but later than
  * its key's timed-out session starts a NEW session.
  */
object IncrementalSessionize {

  /** One keyed observation; (seq, sub) pin the order (µs, event id). */
  final case class SEv(user_id: Long, seq: Long, sub: Long, value: Double)

  /** State: the user's open session. Public top-level (Janino). */
  final case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

  /** One closed session (bounds in µs). */
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** 30-minute inactivity gap, µs — the q_sessionize constant. */
  val GapUs: Long = 30L * 60 * 1000000

  def fromEvents(events: DataFrame): Dataset[SEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("value").cast("double").as("value")).as[SEv]
  }

  /** Append closed sessions; the input stream must carry a watermark. */
  def sessions(events: Dataset[SEv]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) { (uid, it, state) =>
        if (state.hasTimedOut) {
          // idle past the gap: the open session is complete — emit it
          val s = state.get
          state.remove()
          Iterator.single(Session(uid, s.start, s.last, s.n, s.sum))
        } else {
          val evs = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          evs.foreach { e =>
            cur match {
              // >= : an event at EXACTLY gap starts a new session —
              // session_window's semantics ([t, t+gap) windows that
              // merely touch do not merge), which the equality spec
              // pins; a strict > would silently merge exact-gap pairs
              case Some(s) if e.seq - s.last >= GapUs =>
                out += Session(uid, s.start, s.last, s.n, s.sum)
                cur = Some(OpenSession(e.seq, e.seq, 1L, e.value))
              case Some(s) =>
                cur = Some(OpenSession(s.start, e.seq, s.n + 1, s.sum + e.value))
              case None =>
                cur = Some(OpenSession(e.seq, e.seq, 1L, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // the close trigger: watermark past session end + gap
            EvictionClock.set(state, s.last / 1000L + GapUs / 1000L)
          }
          out.iterator
        }
      }
  }
}
