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
  * scale-correct shape. The heavy row stream is PRE-REDUCED before it
  * reaches that group: [[cellsOf]] folds each micro-batch partition
  * to its local (source, len, count) cells map-side, so the singleton
  * shuffle carries O(partitions × sources × grid) cells per batch —
  * never O(batch rows) — and the KS sweep per batch costs
  * |grid| × |sources|, corpus-size-free. (The pre-reduced feed shape
  * is pinned by IncrementalKsDriftSpec's funnel test.)
  *
  * EQUALITY CONTRACT: after any prefix of micro-batches, the emitted
  * rows tagged with that prefix's accumulated doc count equal the
  * batch q_ks_drift computed over exactly the accumulated documents —
  * same grid, same cumulative sums, same round(…, 6) edge
  * (IncrementalKsDriftSpec pins it across chunkings).
  *
  * EVICTION (opt-in): the grid here is raw lengths, so state grows
  * with DISTINCT lengths observed — fine for doc-length domains (≤ a
  * few thousand values); a deployment whose measured variable is
  * unbounded (e.g. bytes) buckets it first (log-scale bucketing
  * preserves KS up to bucket resolution). A deployment with CHURNING
  * sources passes `evictAfterBatches = Some(k)`: the state carries a
  * last-seen batch index per source, and a source idle for more than
  * k micro-batches leaves the histogram entirely — its mass exits the
  * corpus CDF, so later snapshots equal a batch computation over only
  * the RETAINED sources' documents, and a reappearing source restarts
  * COLD (the StateEvictionSpec contract, pinned for this operator in
  * IncrementalKsDriftSpec). The index is the operator's own batch
  * counter — drift batches carry no event time, so batch-count
  * idleness is the honest clock. The histogram fold is NOT
  * redelivery-idempotent: a replayed micro-batch of b docs shifts
  * each CDF by at most b/n — a bounded, self-healing distortion of a
  * monitoring statistic (the spec measures it); deployments needing
  * exact-once feed this from foreachBatch over the store's
  * exactly-once merge instead.
  */
object IncrementalKsDrift {

  /** One streamed observation: a document's source and token length. */
  final case class LenObs(source: String, len: Long)

  /** One histogram cell. */
  final case class Cell(source: String, len: Long, c: Long)

  /** A source's last-seen batch index (eviction bookkeeping). */
  final case class SeenAt(source: String, b: Long)

  /** Accumulated histogram + per-source idleness clock.
    *
    * STATE-SCHEMA COMPATIBILITY: `seen`/`batch` were added in round 13
    * (TTL eviction) and this class is the flatMapGroupsWithState state
    * encoder for BOTH the KS and the chi-square monitor — a checkpoint
    * written before that round will NOT restore against the current
    * encoder (Spark fails the state deserialization, it does not
    * migrate). Restart affected streams from a FRESH checkpoint after
    * upgrading; any future field change here is the same breaking
    * event and must be called out the same way (or introduce a
    * versioned KsStateV2 + explicit migration). */
  final case class KsState(cells: Array[Cell], seen: Array[SeenAt],
      batch: Long)

  /** Per-source KS against the accumulated corpus, tagged with the
    * accumulated doc count (the prefix marker spec assertions key on). */
  final case class KsRow(source: String, ks: Double, n_total: Long)

  def fromDocuments(docs: DataFrame): Dataset[LenObs] = {
    import docs.sparkSession.implicits._
    docs.select(col("source"),
      size(split(trim(col("text")), " ")).cast("long").as("len"))
      .as[LenObs]
  }

  /** Map-side pre-reduction: fold each partition's observations to its
    * local (source, len, count) cells, so the singleton state group
    * receives O(partitions × sources × grid) rows per micro-batch
    * instead of the raw row stream. Shared by KS and chi-square (the
    * monitors fold the same histogram). */
  private[streaming] def cellsOf(obs: Dataset[LenObs]): Dataset[Cell] = {
    import obs.sparkSession.implicits._
    obs.mapPartitions { it =>
      val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
      it.foreach { o =>
        acc((o.source, o.len)) = acc.getOrElse((o.source, o.len), 0L) + 1L
      }
      acc.iterator.map { case ((s, l), c) => Cell(s, l, c) }
    }
  }

  /** Fold one micro-batch's pre-reduced cells into the accumulated
    * state, applying the opt-in idle-source eviction — the shared
    * state transition of the monitor family (KS, chi-square, TVD).
    * Returns the retained cells. */
  private[streaming] def foldState(
      it: Iterator[Cell],
      state: org.apache.spark.sql.streaming.GroupState[KsState],
      evictAfterBatches: Option[Long]): Seq[Cell] = {
    val acc = scala.collection.mutable.Map.empty[(String, Long), Long]
    val seen = scala.collection.mutable.Map.empty[String, Long]
    var batch = 0L
    state.getOption.foreach { st =>
      st.cells.foreach(c => acc((c.source, c.len)) = c.c)
      st.seen.foreach(s => seen(s.source) = s.b)
      batch = st.batch
    }
    it.foreach { c =>
      acc((c.source, c.len)) = acc.getOrElse((c.source, c.len), 0L) + c.c
      seen(c.source) = batch
    }
    evictAfterBatches.foreach { ttl =>
      val idle = seen.collect { case (s, b) if batch - b > ttl => s }.toSet
      if (idle.nonEmpty) {
        acc.keys.filter(k => idle.contains(k._1)).toSeq.foreach(acc.remove)
        idle.foreach(seen.remove)
      }
    }
    val cells = acc.toSeq.map { case ((s, l), c) => Cell(s, l, c) }
    state.update(KsState(cells.toArray,
      seen.toSeq.map { case (s, b) => SeenAt(s, b) }.toArray, batch + 1))
    cells
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

  /** The stream: every micro-batch pre-reduces map-side, folds its
    * cells into the histogram (evicting idle sources when asked), and
    * emits the full per-source KS snapshot. */
  def drift(obs: Dataset[LenObs],
      evictAfterBatches: Option[Long] = None): Dataset[KsRow] = {
    import obs.sparkSession.implicits._
    cellsOf(obs).groupByKey(_ => 0)
      .flatMapGroupsWithState[KsState, KsRow](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) { (_, it, state) =>
        val cells = foldState(it, state, evictAfterBatches)
        val nTotal = cells.map(_.c).sum
        ksOf(cells).map { case (s, d) => KsRow(s, d, nTotal) }.iterator
      }
  }
}
