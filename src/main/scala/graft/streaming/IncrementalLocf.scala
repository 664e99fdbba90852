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
    * (append-per-batch; rows are final when emitted). */
  def locf(obs: Dataset[Obs]): Dataset[Filled] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Carried, Filled](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Obs], state: org.apache.spark.sql.streaming.GroupState[Carried]) =>
          var carried = state.getOption.map(_.v)
          val out = it.toIndexedSeq.sortBy(o => (o.seq, o.sub)).map { o =>
            if (o.v.isDefined) carried = o.v
            Filled(key, o.seq, o.sub, o.v, carried)
          }
          carried.foreach(v => state.update(Carried(v)))
          out.iterator
      }
  }
}
