package graft.streaming

import scala.collection.mutable

import graft.functions.FreqSketch
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy-hitter tracking over an unbounded token stream:
  * per-shard Misra-Gries counter state maintained across micro-batches
  * with `flatMapGroupsWithState` — the streaming twin of the
  * `freq_sketch` aggregate (q_heavy_hitters_sketch), for when the
  * corpus arrives continuously and "top terms so far" must be
  * queryable after every batch without re-scanning history.
  *
  * Scale shape: shard = hash(term) % shards, so (a) state partitions
  * across executors like any keyed stream, (b) a term's ENTIRE stream
  * lands in one shard, and (c) the MG guarantee applies per shard —
  * a term with frequency > N_shard/(k+1) of its own shard's stream
  * survives, which under roughly uniform sharding is a ~shards× tighter
  * bound than one global sketch of the same k. Each shard's state is a
  * bounded k-entry map (the store never grows with the vocabulary),
  * and each batch emits the shard's refreshed candidate set tagged
  * with a per-shard version so consumers keep only the latest.
  *
  * Like the batch sketch, estimates are candidates, not exact counts:
  * the exact-confirm step (a semi-join of the candidate terms against
  * the accumulated corpus) is the same one q_heavy_hitters_sketch
  * runs; IncrementalHeavyHittersSpec drives stream-vs-batch
  * containment (every exact heavy hitter survives the streamed state).
  */
object IncrementalHeavyHitters {

  final case class ShardTok(shard: Int, term: String)

  /** State-store record. Public top-level: the state encoder's
    * generated code must reach the constructor (Janino). */
  final case class ShardState(version: Long, counts: Map[String, Long])

  /** One candidate emission; `version` is the shard's batch counter —
    * consumers keep rows with each shard's max version. */
  final case class Candidate(shard: Int, version: Long, term: String, est: Long)

  /** Deterministic shard of a term (String.hashCode is specified, so
    * replays and restarts shard identically). */
  def shardOf(term: String, shards: Int): Int =
    math.floorMod(term.hashCode, shards)

  /** Wire the stateful sketch over a (possibly streaming) token
    * dataset: k counters per shard, full candidate set re-emitted per
    * shard per batch. */
  def candidates(tokens: Dataset[String], shards: Int, k: Int)
      : Dataset[Candidate] = {
    import tokens.sparkSession.implicits._
    tokens
      .filter(_.nonEmpty)
      .map(t => ShardTok(shardOf(t, shards), t))
      .groupByKey(_.shard)
      .flatMapGroupsWithState[ShardState, Candidate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[ShardTok], state: GroupState[ShardState]) =>
          val prev = state.getOption.getOrElse(ShardState(0L, Map.empty))
          val buf = mutable.HashMap.empty[String, Long] ++= prev.counts
          it.foreach { st =>
            buf.get(st.term) match {
              case Some(c) => buf.update(st.term, c + 1)
              case None =>
                buf.update(st.term, 1L)
                FreqSketch.mgShrink(buf, k)
            }
          }
          val version = prev.version + 1
          state.update(ShardState(version, buf.toMap))
          buf.iterator.map { case (t, c) => Candidate(shard, version, t, c) }
      }
  }
}
