package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming admission control: the incremental twin of
  * q_token_budget's per-source greedy sampling (operators side:
  * `plans.PrefixSum` over the full corpus). Here documents arrive as a
  * stream and each source admits documents until its token budget is
  * consumed, with admission decisions emitted while the stream runs.
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
  * At-least-once safety: state keeps, per source, the running total
  * PLUS the ledger of admitted doc ids. A redelivered admitted
  * document is recognized and skipped — tokens are never
  * double-charged and the admission row is never re-emitted; a
  * redelivered REJECTED document stays rejected for free, because the
  * running total only grows and the greedy test is monotone. Net
  * effect: exactly-once admissions over an at-least-once feed
  * (the spec replays a mid-stream batch and pins identical output).
  * The ledger is bounded by construction — this operator's whole
  * purpose is to cap admissions, so it holds at most
  * budget/min(toks)+1 ids per source, O(budget) not O(stream). (The
  * earlier design kept only the counter and documented redelivery as
  * the deployment's problem; the ledger closes that honestly —
  * contrast IncrementalStateAt, whose max-fold is idempotent without
  * one.)
  */
object IncrementalSourceBudget {

  /** One streamed document; ord = its md5 hex ordering key. */
  final case class BDoc(doc_id: Long, source: String, toks: Long, ord: String)

  /** An admission: the doc plus its source's running total AFTER it. */
  final case class BAdmit(doc_id: Long, source: String, toks: Long,
                          cum_tokens: Long)

  /** Per-source state: tokens admitted so far + admitted-doc ledger
    * (bounded at budget/min(toks)+1 entries — see scaladoc). */
  final case class BState(used: Long, admitted: Array[Long])

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
      .flatMapGroupsWithState[BState, BAdmit](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (src, it, state) =>
        val st = state.getOption.getOrElse(BState(0L, Array.empty[Long]))
        var used = st.used
        val ledger = scala.collection.mutable.LongMap
          .fromZip(st.admitted, Array.fill(st.admitted.length)(true))
        val admitted = it.toSeq.sortBy(d => (d.ord, d.doc_id)).flatMap { d =>
          if (ledger.contains(d.doc_id)) None // redelivery: already charged
          else if (used < budget) {
            used += d.toks
            ledger.update(d.doc_id, true)
            Some(BAdmit(d.doc_id, src, d.toks, used))
          } else None
        }
        state.update(BState(used, ledger.keys.toArray))
        admitted.iterator
      }
  }
}
