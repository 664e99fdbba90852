package graft.streaming

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming per-key EWMA: the stateful twin of q_ewma's ordered batch
  * fold (operators.Coverage7). The batch query folds each user's full
  * time-ordered history; here the fold runs incrementally across
  * micro-batches with one (acc, n) record per key in the state store —
  * "smoothed value so far" is queryable after every batch without
  * re-scanning history, and state size is O(keys), independent of
  * stream length.
  *
  * Ordering contract: within a micro-batch the group's events are
  * sorted by (seq, sub) before folding; ACROSS batches the source must
  * deliver keys' events in non-decreasing (seq, sub) order (true of
  * replayed logs and of any watermarked upstream that emits in event
  * order). Under that contract the streamed fold is BIT-IDENTICAL to
  * the batch fold — IncrementalEwmaSpec pins exact double equality
  * against q_ewma.
  *
  * α and β are passed separately rather than deriving β = 1−α in
  * flight: the batch twin uses the literal 0.7, and 1.0−0.3 in IEEE
  * doubles is not bit-equal to the literal 0.7.
  */
object IncrementalEwma {

  /** One keyed observation; `seq`/`sub` pin the fold order (epoch
    * micros + event id for the driver corpus). */
  final case class Ev(user_id: Long, seq: Long, sub: Long, value: Double)

  /** State-store record. Public top-level: the state encoder's
    * generated code must reach the constructor (Janino). */
  final case class EwmaState(acc: Double, n: Long)

  final case class EwmaRow(user_id: Long, n_events: Long, ewma: Double)

  /** Adapt the driver events table (or a streaming source with the
    * same schema) to the keyed-observation shape. */
  def fromEvents(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(
      col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts").cast("timestamp")).as("seq"),
      col("event_id").cast("long").as("sub"),
      col("value").cast("double").as("value")).as[Ev]
  }

  /** Wire the incremental fold over a (possibly streaming) dataset.
    * Emits each key's refreshed (n, ewma) once per batch it appears in
    * (update output mode; consumers keep the latest row per key).
    *
    * `evictAfterMs` (opt-in, the attribution/locf contract): a key
    * idle past the watermark by the TTL is evicted — its final row is
    * re-emitted once (mapGroupsWithState emits on every invocation,
    * timeout included; consumers keeping latest-per-key see no
    * change), then the state drops. A reappearing key restarts COLD
    * (n back at 0, fold re-seeded). Requires upstream `withWatermark`. */
  def ewma(events: Dataset[Ev], alpha: Double = 0.3, beta: Double = 0.7,
      evictAfterMs: Option[Long] = None): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaRow](timeout) {
        (uid, it, state) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            EwmaRow(uid, last.n, last.acc)
          } else {
            val prev = state.getOption.getOrElse(EwmaState(0.0, 0L))
            val batch = it.toIndexedSeq.sortBy(e => (e.seq, e.sub))
            val acc = batch.foldLeft(prev.acc)((a, e) => alpha * e.value + beta * a)
            val st = EwmaState(acc, prev.n + batch.size)
            state.update(st)
            evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
            EwmaRow(uid, st.n, st.acc)
          }
      }
  }
}
