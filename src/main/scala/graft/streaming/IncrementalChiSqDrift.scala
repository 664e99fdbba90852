package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming chi-square drift: the incremental twin of q_chisq_drift
  * (operators/Coverage19.scala), sharing its state shape AND its state
  * transition with [[IncrementalKsDrift]] — the per-(source, length)
  * count histogram is the sufficient statistic for BOTH monitors, so a
  * deployment running the two pays for one fold (this object exists
  * separately so each statistic's equality contract stays
  * independently pinned).
  *
  * After every micro-batch the operator emits, per source, the
  * chi-square homogeneity statistic of that source's accumulated
  * doc-length histogram against the rest of the accumulated corpus —
  * the significance-weighted reading of the same histogram KS sweeps.
  *
  * STATE is O(sources × grid) in one global group (chi-square needs
  * the cross-source marginals), identical to the KS stance; the
  * per-batch feed into that group is the KS monitor's map-side
  * pre-reduction ([[IncrementalKsDrift.cellsOf]] — O(partitions ×
  * sources × grid) cells per batch, never the raw rows), and the
  * sweep per batch costs |sources| × |grid|, corpus-size-free.
  *
  * EQUALITY CONTRACT: after any prefix of micro-batches, the emitted
  * rows tagged with that prefix's accumulated count equal the batch
  * q_chisq_drift computed over exactly the accumulated documents —
  * same fixed-point reduction (each term floored at 1e-6 into a long;
  * floor of an identical IEEE double is unambiguous, which is what
  * makes the scala fold below bit-equal to the Spark plan AND the
  * DuckDB oracle). Eviction and redelivery stances are
  * IncrementalKsDrift's verbatim — `evictAfterBatches` drops sources
  * idle past the TTL from the shared histogram (cold restart on
  * reappearance), and a replayed micro-batch distorts the statistic
  * boundedly (it is a monitor, not an accountant — exact-once
  * deployments feed from the store's merge).
  */
object IncrementalChiSqDrift {
  import IncrementalKsDrift.{Cell, KsState, LenObs}

  /** Per-source chi-square against the accumulated rest-of-corpus,
    * tagged with the accumulated doc count. `dof` = |grid| − 1. */
  final case class ChiRow(source: String, chisq: Double, dof: Long,
      n: Long, n_total: Long)

  def fromDocuments(docs: DataFrame): Dataset[LenObs] =
    IncrementalKsDrift.fromDocuments(docs)

  /** The chi-square sweep over a histogram — shared by the stream fold
    * and the spec's prefix recompute. Mirrors the batch plan's
    * arithmetic exactly: E = n_s·c_b/n as one IEEE expression, each
    * observed-vs-expected term floored at 1e-6 into a long, exact
    * integer sum, one division at the edge. */
  def chisqOf(cells: Seq[Cell]): Seq[ChiRow] = {
    val grid = cells.map(_.len).distinct.sorted
    val nTot = cells.map(_.c).sum
    val byLen = cells.groupBy(_.len).view.mapValues(_.map(_.c).sum).toMap
    // a source with an empty complement (single-source corpus) has no
    // rest to test against — skip it, mirroring the batch plan's
    // n < ntot guard (unguarded, the three implementations would
    // disagree on floor(NaN))
    cells.groupBy(_.source).toSeq.sortBy(_._1)
      .filter(_._2.map(_.c).sum < nTot).map { case (src, cs) =>
      val n = cs.map(_.c).sum
      val mine = cs.map(c => c.len -> c.c).toMap
      val fp = grid.map { l =>
        val cb = byLen(l)
        val o = mine.getOrElse(l, 0L).toDouble
        val e = n.toDouble * cb / nTot
        val or = (cb - mine.getOrElse(l, 0L)).toDouble
        val er = (nTot - n).toDouble * cb / nTot
        val ts = (o - e) * (o - e) / e
        val tr = (or - er) * (or - er) / er
        math.floor(ts * 1000000).toLong + math.floor(tr * 1000000).toLong
      }.sum
      ChiRow(src, fp.toDouble / 1000000, grid.size.toLong - 1, n, nTot)
    }
  }

  /** The stream: every micro-batch pre-reduces map-side, folds its
    * cells into the shared histogram shape (evicting idle sources when
    * asked), and emits the full per-source snapshot. */
  def drift(obs: Dataset[LenObs],
      evictAfterBatches: Option[Long] = None): Dataset[ChiRow] = {
    import obs.sparkSession.implicits._
    IncrementalKsDrift.cellsOf(obs).groupByKey(_ => 0)
      .flatMapGroupsWithState[KsState, ChiRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val cells = IncrementalKsDrift.foldState(it, state, evictAfterBatches)
        chisqOf(cells).iterator
      }
  }
}
