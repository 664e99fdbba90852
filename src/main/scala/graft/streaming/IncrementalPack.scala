package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming sequence packing: the incremental twin of
  * q_pack_sequences (PipelineOps — per-shard greedy binning,
  * `seq_no = floor(prior tokens / capacity)`). Documents arrive as a
  * stream; each doc's pack assignment is emitted while the stream
  * runs, and the per-shard running token total hands off across
  * micro-batch boundaries so a pack can straddle any number of
  * batches.
  *
  * ORDER CONTRACT (the same one the batch window declares): docs are
  * packed in ascending doc_id within their shard, so the feed must be
  * doc_id-monotone per shard ACROSS batches; the fold sorts each
  * micro-batch's group iterator by doc_id (flatMapGroupsWithState
  * makes no intra-batch order promise). Feeding the stream in
  * id-chunked batches reproduces the batch query's assignment
  * EXACTLY (IncrementalPackSpec pins row-set equality).
  *
  * REDELIVERY STANCE (at-least-once): every doc is packed (packing
  * admits all — there is no rejection to bound a ledger with, unlike
  * IncrementalSourceBudget), so per-doc id ledgers would grow
  * O(stream). Instead the state keeps the shard's HIGH-WATER doc_id:
  * under the monotone-feed contract, a doc at or below it can only
  * be a redelivery — skipped without re-charging tokens and without
  * re-emitting its row (exactly-once packing effect over an
  * at-least-once feed, O(1) state per shard). The honest limit of
  * that trade: a genuinely NEW doc arriving below the high-water
  * (true out-of-order delivery) is indistinguishable from a replay
  * and is dropped — out-of-order feeds are outside this operator's
  * contract, exactly as they are outside the batch window's.
  */
object IncrementalPack {

  /** One streamed document, pre-sharded. */
  final case class PDoc(doc_id: Long, shard: Long, n_tokens: Long)

  /** A pack assignment: the doc plus its sequence number. */
  final case class PPack(doc_id: Long, shard: Long, n_tokens: Long,
                         seq_no: Long)

  /** Per-shard state: tokens packed so far + high-water doc_id. */
  final case class PState(used: Long, maxDoc: Long)

  /** The batch query's document shape (shard = doc_id % 32). */
  def fromDocuments(docs: DataFrame): Dataset[PDoc] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      (col("doc_id") % 32).cast("long").as("shard"),
      size(split(trim(col("text")), " ")).cast("long").as("n_tokens"))
      .as[PDoc]
  }

  def pack(docs: Dataset[PDoc], capacity: Long): Dataset[PPack] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[PState, PPack](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (shard, it, state) =>
        val st = state.getOption.getOrElse(PState(0L, Long.MinValue))
        var used = st.used
        var maxDoc = st.maxDoc
        val out = it.toSeq.sortBy(_.doc_id).flatMap { d =>
          if (d.doc_id <= maxDoc) None // redelivery: already packed
          else {
            val seq = used / capacity
            used += d.n_tokens
            maxDoc = d.doc_id
            Some(PPack(d.doc_id, shard, d.n_tokens, seq))
          }
        }
        state.update(PState(used, maxDoc))
        out.iterator
      }
  }
}
