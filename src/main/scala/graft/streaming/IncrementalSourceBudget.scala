package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming admission control: the incremental twin of
  * q_token_budget's per-source greedy sampling (operators side:
  * `plans.PrefixSum` over the full corpus). Here documents arrive as a
  * stream and each source admits documents until its token budget is
  * consumed — the state store keeps ONE counter per source (tokens
  * admitted so far), so state is O(sources) regardless of stream
  * length, and admission decisions are emitted while the stream runs.
  *
  * Admission is the same greedy rule as the batch query: a document is
  * admitted iff its source's running total BEFORE it is under budget
  * (every source lands within one document of its quota). The fold
  * sorts each micro-batch's group iterator by the deterministic
  * (ord, doc_id) key — flatMapGroupsWithState makes no intra-batch
  * order promise — so feeding the stream in ord-chunked batches
  * reproduces the batch query's md5-order admission EXACTLY
  * (IncrementalSourceBudgetSpec pins set equality against
  * q_token_budget).
  *
  * At-least-once caveat, stated honestly: unlike IncrementalStateAt's
  * max-fold, admission is NOT redelivery-idempotent (a replayed doc
  * would double-count its tokens) — deploy behind an exactly-once
  * sink, or dedup by doc_id upstream (streaming.StreamingOps
  * .dedupStream / IncrementalDedup are the in-house tools for that).
  */
object IncrementalSourceBudget {

  /** One streamed document; ord = its md5 hex ordering key. */
  final case class BDoc(doc_id: Long, source: String, toks: Long, ord: String)

  /** An admission: the doc plus its source's running total AFTER it. */
  final case class BAdmit(doc_id: Long, source: String, toks: Long,
                          cum_tokens: Long)

  def fromDocuments(docs: DataFrame): Dataset[BDoc] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("source").as("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
      md5(col("doc_id").cast("string").cast("binary")).as("ord")).as[BDoc]
  }

  def admit(docs: Dataset[BDoc], budget: Long): Dataset[BAdmit] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, BAdmit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (src, it, state) =>
        var used = state.getOption.getOrElse(0L)
        val admitted = it.toSeq.sortBy(d => (d.ord, d.doc_id)).flatMap { d =>
          if (used < budget) {
            used += d.toks
            Some(BAdmit(d.doc_id, src, d.toks, used))
          } else None
        }
        state.update(used)
        admitted.iterator
      }
  }
}
