package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming total-variation-distance drift: the incremental twin of
  * q_drift_tvd (operators/Coverage22.scala), third member of the
  * monitor family — it shares its state shape AND its state transition
  * with [[IncrementalKsDrift]] and [[IncrementalChiSqDrift]]: the
  * per-(source, length) count histogram is the sufficient statistic
  * for all three, so a deployment running the trio pays for ONE fold.
  *
  * After every micro-batch the operator emits, per source, the total
  * variation distance (10⁶ fixed-point) between that source's
  * accumulated doc-length distribution and the rest of the accumulated
  * corpus — the bounded [0, 1] mass-moved reading that thresholds
  * directly, next to KS's worst CDF gap and chi-square's
  * significance-weighted distortion.
  *
  * The sweep is PURE INTEGER — ½·Σ|p − q| cross-multiplied to
  * Σ|o·nr − r·n| over exact longs, one integer division at the 10⁶
  * edge — so the scala fold below is trivially bit-equal to the Spark
  * batch plan and the DuckDB oracle (no floor-of-double anywhere).
  *
  * STATE, eviction, and redelivery stances are IncrementalKsDrift's
  * verbatim (one global group of O(sources × grid) cells fed by the
  * map-side pre-reduction; `evictAfterBatches` drops idle sources;
  * replay distorts boundedly — monitors feed exactly-once from the
  * store's merge when that matters). EQUALITY CONTRACT
  * (IncrementalTvdDriftSpec): after any prefix of micro-batches the
  * emitted rows equal the batch q_drift_tvd over exactly the
  * accumulated documents.
  */
object IncrementalTvdDrift {
  import IncrementalKsDrift.{Cell, KsState, LenObs}

  /** Per-source TVD (10⁶ fixed-point) against the accumulated
    * rest-of-corpus, tagged with the accumulated doc count. */
  final case class TvdRow(source: String, tvd_fp: Long, n: Long,
      n_total: Long)

  def fromDocuments(docs: DataFrame): Dataset[LenObs] =
    IncrementalKsDrift.fromDocuments(docs)

  /** The TVD sweep over a histogram — shared by the stream fold and
    * the spec's prefix recompute. Mirrors the batch plan exactly:
    * Σ|o·nr − (cb − o)·n| per source as exact longs, then one
    * truncating division by 2·n·nr at 10⁶ scale. Single-source
    * corpora emit nothing (the n < ntot guard the family shares). */
  def tvdOf(cells: Seq[Cell]): Seq[TvdRow] = {
    val nTot = cells.map(_.c).sum
    val byLen = cells.groupBy(_.len).view.mapValues(_.map(_.c).sum).toMap
    cells.groupBy(_.source).toSeq.sortBy(_._1)
      .filter(_._2.map(_.c).sum < nTot).map { case (src, cs) =>
        val n = cs.map(_.c).sum
        val nr = nTot - n
        val mine = cs.map(c => c.len -> c.c).toMap
        val sad = byLen.toSeq.map { case (l, cb) =>
          val o = mine.getOrElse(l, 0L)
          math.abs(o * nr - (cb - o) * n)
        }.sum
        TvdRow(src, sad * 1000000L / (2L * n * nr), n, nTot)
      }
  }

  /** The stream: every micro-batch pre-reduces map-side, folds its
    * cells into the shared histogram shape (evicting idle sources when
    * asked), and emits the full per-source snapshot. */
  def drift(obs: Dataset[LenObs],
      evictAfterBatches: Option[Long] = None): Dataset[TvdRow] = {
    import obs.sparkSession.implicits._
    IncrementalKsDrift.cellsOf(obs).groupByKey(_ => 0)
      .flatMapGroupsWithState[KsState, TvdRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val cells = IncrementalKsDrift.foldState(it, state, evictAfterBatches)
        tvdOf(cells).iterator
      }
  }
}
