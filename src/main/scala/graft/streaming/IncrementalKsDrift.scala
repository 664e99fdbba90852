package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming per-source distribution drift: the incremental twin of
  * q_ks_drift (operators/Coverage18.scala). Documents arrive as a
  * stream; after every micro-batch the operator emits, per source,
  * the Kolmogorov–Smirnov distance between that source's accumulated
  * doc-length distribution and the whole accumulated corpus's —
  * continuous monitoring of the same statistic the batch query
  * computes once.
  *
  * STATE is the per-(source, length) count histogram — O(sources ×
  * grid), NOT O(stream): the evaluation grid is the set of distinct
  * doc lengths, bounded by the length domain regardless of how many
  * documents flow through. All sources fold in ONE state group: KS
  * needs the cross-source corpus CDF, so the histogram must be
  * globally visible — and it is grid-sized, so a single group is the
  * scale-correct shape (the heavy row stream reduces into it; the KS
  * sweep per batch costs |grid| × |sources|, corpus-size-free).
  *
  * EQUALITY CONTRACT: after any prefix of micro-batches, the emitted
  * rows tagged with that prefix's accumulated doc count equal the
  * batch q_ks_drift computed over exactly the accumulated documents —
  * same grid, same cumulative sums, same round(…, 6) edge
  * (IncrementalKsDriftSpec pins it across chunkings).
  *
  * EVICTION STANCE (documented, not silent): the grid here is raw
  * lengths, so state grows with DISTINCT lengths observed — fine for
  * doc-length domains (≤ a few thousand values). A deployment whose
  * measured variable is unbounded (e.g. bytes) buckets it first
  * (log-scale bucketing preserves KS up to bucket resolution), and a
  * deployment with churning sources evicts sources idle past a TTL by
  * carrying a last-seen batch index per source — both are
  * grid-shaping choices outside the drift algebra. The histogram fold
  * is NOT redelivery-idempotent: a replayed micro-batch of b docs
  * shifts each CDF by at most b/n — a bounded, self-healing
  * distortion of a monitoring statistic (the spec measures it);
  * deployments needing exact-once feed this from foreachBatch over
  * the store's exactly-once merge instead.
  */
object IncrementalKsDrift {

  /** One streamed observation: a document's source and token length. */
  final case class LenObs(source: String, len: Long)

  /** One histogram cell. */
  final case class Cell(source: String, len: Long, c: Long)

  /** Accumulated histogram. */
  final case class KsState(cells: Array[Cell])

  /** Per-source KS against the accumulated corpus, tagged with the
    * accumulated doc count (the prefix marker spec assertions key on). */
  final case class KsRow(source: String, ks: Double, n_total: Long)

  def fromDocuments(docs: DataFrame): Dataset[LenObs] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"),
      size(split(trim(col("text")), " ")).cast("long").as("len"))
      .as[LenObs]
  }

  /** The KS sweep over a histogram — shared by the stream fold and the
    * spec's prefix recompute, so the two cannot drift. Mirrors the
    * batch query's arithmetic exactly: integer cumulative counts,
    * double division at the edge, round-half-up to 6, −0.0 normalized. */
  def ksOf(cells: Seq[Cell]): Seq[(String, Double)] = {
    val grid = cells.map(_.len).distinct.sorted
    val nTot = cells.map(_.c).sum
    val byLen = cells.groupBy(_.len).view.mapValues(_.map(_.c).sum).toMap
    val cumAll = grid.scanLeft(0L)((a, l) => a + byLen(l)).tail
    cells.groupBy(_.source).toSeq.sortBy(_._1).map { case (src, cs) =>
      val n = cs.map(_.c).sum
      val mine = cs.map(c => c.len -> c.c).toMap
      val cum = grid.scanLeft(0L)((a, l) => a + mine.getOrElse(l, 0L)).tail
      val d = grid.indices.map(i =>
        math.abs(cum(i).toDouble / n - cumAll(i).toDouble / nTot)).max
      val rounded = BigDecimal(d)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
      (src, rounded)
    }
  }

  /** The stream: every micro-batch folds its observations into the
    * histogram and emits the full per-source KS snapshot. */
  def drift(obs: Dataset[LenObs]): Dataset[KsRow] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_ => 0)
      .flatMapGroupsWithState[KsState, KsRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
        state.getOption.foreach(_.cells.foreach(c =>
          acc((c.source, c.len)) = c.c))
        it.foreach { o =>
          acc((o.source, o.len)) = acc.getOrElse((o.source, o.len), 0L) + 1L
        }
        val cells = acc.toSeq.map { case ((s, l), c) => Cell(s, l, c) }
        state.update(KsState(cells.toArray))
        val nTotal = cells.map(_.c).sum
        ksOf(cells).map { case (s, d) => KsRow(s, d, nTotal) }.iterator
      }
  }
}
