package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming grid-histogram percentiles: the per-batch monitor twin of
  * q_grid_percentile (operators/Coverage19.scala) and of the durable
  * `cdc.GridPercentile` view read. Three forms, one arithmetic:
  *
  *   - batch query: one histogram agg over the corpus, oracle-backed;
  *   - incremental view: the histogram maintained exactly-once through
  *     the store's change feed, percentiles at the read edge;
  *   - THIS: the histogram folded in stream state, percentiles emitted
  *     after every micro-batch — the live dashboard feed.
  *
  * STATE is the per-(group, bucket) count histogram — O(groups × grid)
  * (the 64-bucket grid is fixed by construction), keyed by group so
  * state distributes across executors (unlike the drift monitors,
  * percentiles need no cross-group marginals — each group is
  * independent, which is exactly what lets this one shard).
  *
  * EQUALITY CONTRACT: after any prefix of micro-batches, the emitted
  * rows tagged with the group's accumulated count equal the batch
  * query over exactly the accumulated documents — the same integer
  * ceil-threshold sweep (`(p·n+99) div 100`, min bucket with cum ≥
  * threshold), which is pure integer arithmetic and therefore
  * trivially engine- and fold-exact. Redelivery shifts counts like
  * any histogram fold (the drift monitors' documented stance);
  * exact-once deployments use the incremental-view form.
  */
object IncrementalGridPercentile {

  /** One streamed observation: group key + pre-bucketed measure. */
  final case class BObs(group: String, bucket: Long)

  /** Histogram state for one group. */
  final case class BState(counts: Map[Long, Long])

  /** One percentile row, tagged with the group's accumulated count. */
  final case class PctRow(group: String, p: Long, edge: Long, n: Long)

  /** The batch query's observation shape (source, n_chars bucket /16
    * capped at 63). */
  def fromDocuments(docs: DataFrame): Dataset[BObs] = {
    import docs.sparkSession.implicits._
    docs.select(col("source").as("group"),
      least(expr("CAST(n_chars AS BIGINT) div 16"), lit(63L)).as("bucket"))
      .as[BObs]
  }

  /** The ceil-threshold sweep — shared by the stream fold and the
    * spec's prefix recompute; integer-for-integer the batch query's
    * read edge (and GridPercentile.percentiles'). */
  def sweep(group: String, counts: Map[Long, Long], pcts: Seq[Long],
      width: Long): Seq[PctRow] = {
    // a percentile outside (0, 100] makes the ceil threshold exceed the
    // total count, sending indexWhere to -1 and grid(-1) to a crash —
    // reject at the boundary instead of inside a running stream
    require(pcts.forall(p => p >= 1L && p <= 100L),
      s"percentiles must be in [1, 100], got ${pcts.mkString(", ")}")
    val grid = counts.keys.toSeq.sorted
    val n = counts.values.sum
    val cum = grid.scanLeft(0L)((a, b) => a + counts(b)).tail
    pcts.map { p =>
      val thresh = (p * n + 99) / 100
      val i = cum.indexWhere(_ >= thresh)
      PctRow(group, p, grid(i) * width, n)
    }
  }

  /** The stream: per group, fold the bucket histogram and emit the
    * full percentile snapshot every micro-batch. */
  def percentiles(obs: Dataset[BObs], pcts: Seq[Long] = Seq(50L, 90L, 99L),
      width: Long = 16L): Dataset[PctRow] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.group)
      .flatMapGroupsWithState[BState, PctRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (group, it, state) =>
        val acc = scala.collection.mutable.Map.empty[Long, Long]
        state.getOption.foreach(_.counts.foreach { case (b, c) =>
          acc(b) = c
        })
        it.foreach(o => acc(o.bucket) = acc.getOrElse(o.bucket, 0L) + 1L)
        val counts = acc.toMap
        state.update(BState(counts))
        sweep(group, counts, pcts, width).iterator
      }
  }
}
