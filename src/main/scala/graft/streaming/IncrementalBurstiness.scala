package graft.streaming

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming per-user inter-arrival moments: the stateful twin of
  * q_burstiness (operators.Coverage16). The batch query computes each
  * user's gap moments (n, Σg, Σg²) with a key-partitioned window over
  * the full history; here the moments fold incrementally across
  * micro-batches with ONE 4-long record per key in the state store —
  * the live "is this key turning bursty?" signal a bot-detection
  * pipeline actually serves, state O(keys) and independent of stream
  * length.
  *
  * All-integer like the batch twin: gaps are floored epoch SECONDS
  * (`floorDiv(seq, 1e6)`), the moments are Long sums, so the streamed
  * fold is EXACTLY the batch fold under the in-order contract — no
  * IEEE-association caveat at all (the EWMA twin needs bit-equality
  * argumentation; integer addition is simply commutative).
  *
  * Ordering contract (the EWMA/locf contract): within a micro-batch
  * the group's rows are sorted by (seq, sub); across batches the
  * source must deliver each key's events in non-decreasing (seq, sub)
  * order. The cross-batch gap is charged via the carried `lastSec` —
  * a batch boundary between two events produces the same gap as
  * adjacency within one batch (spec pins split-invariance).
  *
  * `evictAfterMs` (opt-in): a key idle past the watermark by the TTL
  * is evicted after a final re-emit; a reappearing key restarts COLD
  * (its first event seeds `lastSec` and produces no gap) — the
  * attribution/locf cold-restart contract.
  */
object IncrementalBurstiness {

  /** One keyed observation; `seq` = epoch micros, `sub` breaks ties. */
  final case class Ev(user_id: Long, seq: Long, sub: Long)

  /** State: last floored second + the three gap moments. Public
    * top-level for Janino's sake (the house state-class rule). */
  final case class BurstState(lastSec: Long, n: Long, s: Long, q: Long)

  /** Emitted per key per batch: the refreshed moments. */
  final case class BurstRow(user_id: Long, n: Long, s: Long, q: Long)

  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub")).as[Ev]
  }

  def moments(events: Dataset[Ev],
      evictAfterMs: Option[Long] = None): Dataset[BurstRow] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[BurstState, BurstRow](timeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            BurstRow(uid, last.n, last.s, last.q)
          } else {
            val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
            val secs = batch.map(e => Math.floorDiv(e.seq, 1000000L))
            val init = state.getOption match {
              case Some(st) => st
              case None => BurstState(secs.head, 0L, 0L, 0L)
            }
            val seeded = state.getOption.isEmpty
            val start = if (seeded) secs.tail else secs
            val st = start.foldLeft(init) { (acc, sec) =>
              val g = sec - acc.lastSec
              BurstState(sec, acc.n + 1, acc.s + g, acc.q + g * g)
            }
            state.update(st)
            evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
            BurstRow(uid, st.n, st.s, st.q)
          }
      }
  }

  /** The shared bucket formula: fold a latest-per-key moments table to
    * the q_burstiness histogram — ⌊10·n·(n·Σg²−S²) / ((n−1)·S²)⌋
    * capped at 30, users with < 2 gaps dropped. Applied identically to
    * the batch aggregate and the streamed state, so the spec's
    * histogram comparison exercises ONLY the incremental fold. */
  def histogram(rows: DataFrame): DataFrame =
    rows.filter(col("n") >= 2)
      .groupBy(least(
          expr("(10 * n * (n*q - s*s)) div ((n-1) * s * s)"),
          lit(30L)).as("bucket"))
      .agg(count(lit(1)).as("n_users"))
}
