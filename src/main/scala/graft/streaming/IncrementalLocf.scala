package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming LOCF: the stateful twin of q_locf (operators.Coverage8).
  * The batch query forward-fills nulls with an IGNORE NULLS window over
  * each key's full history; here the carried observation lives in the
  * state store — one (value) record per key — so gaps fill across
  * micro-batch boundaries without re-reading history. Same ordering
  * contract as IncrementalEwma: in-batch events sort by (seq, sub),
  * cross-batch order is the source's responsibility; under it the
  * streamed fill is row-identical to the batch window
  * (IncrementalLocfSpec pins equality against q_locf's fill column).
  */
object IncrementalLocf {

  /** One keyed observation; `v` is None for the gaps to fill. */
  final case class Obs(key: Long, seq: Long, sub: Long, v: Option[Double])

  /** State-store record. Public top-level: the state encoder's
    * generated code must reach the constructor (Janino). */
  final case class Carried(v: Double)

  final case class Filled(key: Long, seq: Long, sub: Long,
      v: Option[Double], filled: Option[Double])

  /** Wire the incremental fill over a (possibly streaming) dataset.
    * Emits every observation of the batch with its filled value
    * (append-per-batch; rows are final when emitted).
    *
    * `evictAfterMs` (opt-in) bounds state under unbounded key churn:
    * a key idle past the watermark by more than the TTL has its
    * carried value evicted (event-time timeout; requires an upstream
    * `withWatermark`). Contract: an evicted key that reappears
    * restarts COLD — leading gaps stay unfilled until a fresh
    * observation arrives. Active keys fill identically to NoTimeout. */
  def locf(obs: Dataset[Obs],
      evictAfterMs: Option[Long] = None): Dataset[Filled] = {
    import obs.sparkSession.implicits._
    val timeout =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Carried, Filled](
        org.apache.spark.sql.streaming.OutputMode.Append, timeout) {
        (key: Long, it: Iterator[Obs], state: org.apache.spark.sql.streaming.GroupState[Carried]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = it.toIndexedSeq.sortBy(o => (o.seq, o.sub))
            var carried = state.getOption.map(_.v)
            val out = batch.map { o =>
              if (o.v.isDefined) carried = o.v
              Filled(key, o.seq, o.sub, o.v, carried)
            }
            carried.foreach(v => state.update(Carried(v)))
            // eviction clock is event time (seq is µs; timeouts take ms)
            if (state.exists) evictAfterMs.foreach(ttl =>
              EvictionClock.set(state, batch.map(_.seq).max / 1000L + ttl))
            out.iterator
          }
      }
  }
}
