package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Event-time timeout setter shared by every evicting stateful twin:
  * CLAMPS the desired eviction instant to just past the current
  * watermark. Spark's `setTimeoutTimestamp` THROWS when handed a
  * timestamp at or below the watermark — reachable whenever one key's
  * far-future event advances the watermark past another key's
  * `last event + TTL` before that key's next (still-admitted) row is
  * processed: the late-row filter runs against the PREVIOUS batch's
  * watermark, so the function can see a row whose natural timeout is
  * already in the past (verified against GroupStateImpl in Spark
  * 4.1.2). The clamp preserves the contract — such a key is ALREADY
  * idle past its TTL, so it evicts at the next timeout-processing
  * opportunity instead of crashing the query (and re-crashing it on
  * every checkpoint restart). */
private[streaming] object EvictionClock {
  def set(state: GroupState[_], desiredMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(desiredMs, state.getCurrentWatermarkMs + 1))
}
