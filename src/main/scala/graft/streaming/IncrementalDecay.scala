package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming time-decayed accumulator: the stateful twin of
  * q_decay_sum (operators.Coverage16) and the shape every online
  * feature store maintains ("engagement score, half-life 30 days").
  * The batch query weights each event against the CORPUS max ts; the
  * stream can't know the future, so state carries the sum decayed to
  * the key's LATEST event: on arrival the carried value decays by the
  * elapsed gap and the new value adds. Exponential decay folds
  * associatively — decay(a·w(Δ1), Δ2) = a·w(Δ1+Δ2) — so the carried
  * value at time t equals the batch formula anchored at t, and
  * re-anchoring to any later T is one multiplication:
  * S_T = S_t · 0.5^((T−t)/hl). IncrementalDecaySpec pins exactly that
  * against q_decay_sum, plus split-invariance (the fold order is the
  * per-key event order, identical under any micro-batch split).
  *
  * Same ordering contract and opt-in `evictAfterMs` event-time
  * eviction as the attribution/locf twins (an evicted key restarts at
  * 0 — which is also where its decayed value was heading).
  */
object IncrementalDecay {

  final case class DEv(user_id: Long, seq: Long, sub: Long, value: Double)

  /** State: decayed sum anchored at `last` (µs). Public (Janino). */
  final case class Anchored(last: Long, sum: Double)

  /** Per-event emission: the score decayed to this event's time. */
  final case class Decayed(user_id: Long, seq: Long, sub: Long, score: Double)

  /** 30-day half-life, µs — the q_decay_sum constant. */
  val HalfLifeUs: Double = 30.0 * 86400 * 1000000

  def fromEvents(events: DataFrame): Dataset[DEv] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("value").cast("double").as("value")).as[DEv]
  }

  def scores(events: Dataset[DEv],
      evictAfterMs: Option[Long] = None): Dataset[Decayed] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Anchored, Decayed](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        (uid, it, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
          var cur = state.getOption
          val out = batch.map { e =>
            val s = cur match {
              case Some(a) =>
                a.sum * math.pow(0.5, (e.seq - a.last) / HalfLifeUs) + e.value
              case None => e.value
            }
            cur = Some(Anchored(e.seq, s))
            Decayed(uid, e.seq, e.sub, s)
          }
          cur.foreach { a =>
            state.update(a)
            evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, a.last / 1000L + ttl))
          }
          out.iterator
        }
      }
  }
}
