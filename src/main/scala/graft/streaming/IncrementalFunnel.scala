package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming windowed funnel: the stateful twin of q_funnel_window
  * (operators.Coverage16). The batch query computes each user's
  * view→click→purchase depth anchored at their FIRST view with the
  * whole window bounded at 3 days from the anchor; here the anchor
  * timestamps live in the state store — ONE record per user, three
  * optional timestamps — and a row `(user_id, depth)` is APPENDED
  * whenever the user's depth increases (≤ 3 emissions per user,
  * monotone), so a funnel dashboard folds the stream with
  * last-depth-per-user and matches the batch distribution at any
  * cut. State is O(users with a view); a completed (depth-3) record
  * is RETAINED — three longs — because dropping it would let a later
  * view re-anchor and re-emit depth 1, breaking monotonicity and the
  * last-per-user fold. Only eviction (below) removes state.
  *
  * Ordering contract (the IncrementalEwma/Attribution family's):
  * within a micro-batch a user's events sort by (seq, type-phase,
  * sub) — view before click before purchase WITHIN an equal
  * timestamp, because the batch query's `ts >= t1` admits a step at
  * exactly its anchor's timestamp regardless of event-id order;
  * across batches the source delivers each key's events in
  * non-decreasing (seq, sub) order, and an equal-seq step pair must
  * not split across batches (the already-processed earlier batch
  * cannot see the later anchor). Under it the last-per-user depth
  * equals batch q_funnel_window exactly (IncrementalFunnelSpec pins
  * equality across micro-batch splits and the same-µs tie).
  *
  * `evictAfterMs` (opt-in, the family's knob) bounds state under
  * unbounded user churn via event-time timeout (requires an upstream
  * `withWatermark`). Cold-restart contract (the family's): an evicted
  * user who reappears re-anchors at their next view — they can
  * re-emit depths below what they once reached, diverging from the
  * batch query's forever-first anchor. Consumers that fold with
  * last-depth-per-user should therefore fold with MAX-depth-per-user
  * when eviction is on. The spec pins active-key equality and the
  * bounded-state/cold-restart behavior separately. */
object IncrementalFunnel {

  /** One keyed observation; (seq, sub) pin the order (µs, event id). */
  final case class FEv(user_id: Long, seq: Long, sub: Long,
      event_type: String)

  /** State: the user's funnel anchors (µs; MinValue = unset).
    * Public top-level case class (Janino must reach the constructor). */
  final case class Anchors(t1: Long, t2: Long, t3: Long)

  /** One depth transition (monotone per user). */
  final case class Depth(user_id: Long, depth: Int)

  /** The q_funnel_window constants: step types and the 3-day window. */
  val WindowUs: Long = 3L * 86400 * 1000000
  private val Unset = Long.MinValue

  def fromEvents(events: DataFrame): Dataset[FEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("event_type").as("event_type")).as[FEv]
  }

  /** Append depth transitions; fold with last-per-user to read the
    * funnel distribution. */
  def depths(events: Dataset[FEv],
      evictAfterMs: Option[Long] = None): Dataset[Depth] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Anchors, Depth](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        timeout) { (uid, it, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // type-phase tiebreak at equal seq: the batch query admits a
          // click AT its anchor's exact timestamp (ts >= t1), so the
          // anchor must be applied first regardless of event-id order
          def phase(t: String): Int = t match {
            case "view" => 0; case "click" => 1; case "purchase" => 2
            case _ => 3
          }
          val batch = it.toIndexedSeq
            .sortBy(e => (e.seq, phase(e.event_type), e.sub))
          var a = state.getOption.getOrElse(Anchors(Unset, Unset, Unset))
          val before = a
          batch.foreach { e =>
            e.event_type match {
              // the FIRST view anchors; in-order delivery makes the
              // first seen the first overall
              case "view" if a.t1 == Unset => a = a.copy(t1 = e.seq)
              case "click" if a.t1 != Unset && a.t2 == Unset &&
                e.seq >= a.t1 && e.seq <= a.t1 + WindowUs =>
                a = a.copy(t2 = e.seq)
              case "purchase" if a.t2 != Unset && a.t3 == Unset &&
                e.seq >= a.t2 && e.seq <= a.t1 + WindowUs =>
                a = a.copy(t3 = e.seq)
              case _ => ()
            }
          }
          def depthOf(x: Anchors): Int =
            if (x.t3 != Unset) 3 else if (x.t2 != Unset) 2
            else if (x.t1 != Unset) 1 else 0
          val (d0, d1) = (depthOf(before), depthOf(a))
          if (a.t1 != Unset) {
            // depth-0 users (no view yet) store nothing — state is
            // O(users IN the funnel), and an all-unset record carries
            // no information a fresh one wouldn't. Depth-3 records
            // STAY (see scaladoc): their t1/t2/t3 guards block every
            // further transition, which is exactly the monotonicity
            // contract a removed record could not enforce.
            if (a != before) state.update(a)
            // activity refreshes the eviction clock (event time: TTL
            // past the user's own latest event; seq is µs, timeouts ms)
            evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
          }
          // emit every transition passed through, not just the final
          // depth — monotone ≤3 rows per user lets a consumer cut the
          // stream at any point and still see the then-current depth
          Iterator.range(d0 + 1, d1 + 1).map(Depth(uid, _))
        }
      }
  }
}
