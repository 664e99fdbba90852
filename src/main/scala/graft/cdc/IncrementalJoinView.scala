package graft.cdc

import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of views that JOIN TWO mirrored tables —
  * the classic delta-join algebra folded into the signed-delta group
  * machinery `IncrementalView` already has. The reference's mirror
  * feeds exactly this downstream shape (orders ⋈ customers revenue
  * rollups over the Postgres sink tables).
  *
  * ALGEBRA. For J = A ⋈ B (inner equi-join) with A advancing
  * fromA→toA and B advancing fromB→toB:
  *
  *   ΔJ = ΔA ⋈ B@toB  ∪  A@fromA ⋈ ΔB
  *
  * (signed multisets; derivation: A₁⋈B₁ − A₀⋈B₀ = (A₀+ΔA)⋈B₁ − A₀⋈B₀
  * = ΔA⋈B₁ + A₀⋈(B₁−B₀). The cross term ΔA⋈ΔB is inside leg 1, NOT a
  * third leg — B@toB already contains ΔB.) Each leg's sign is the
  * delta row's own sign (snapshot rows count +1), so the combined
  * feed is a valid signed change feed and flows through
  * `IncrementalView.delta` / `mergeDelta` unchanged — no new
  * atomicity machinery, the round-10 distinct-cascade move.
  *
  * SCALE. The deltas are micro-batch-sized and ride BROADCAST into
  * both legs; the snapshot sides never shuffle. When a leg's join
  * keys are the snapshot table's merge PKs (orders ⋈ customers on
  * customers' PK), the snapshot read is a `readKeysPrunedAt` POINT
  * LOOKUP — only the buckets hosting the delta's keys open,
  * regardless of table size. Otherwise the leg is one pruned-column
  * scan of that snapshot with a broadcast delta — per REFRESH, never
  * per row (the classic IVM cost model with and without an index).
  * Refresh cost: O(Δ · join fan-out + touched view groups).
  *
  * SUPPORTED AGGREGATES: n, sums, vars, mins/maxs (the K-extreme
  * buffers rebuild from the JOINED snapshot at the target versions
  * when drained). COUNT(DISTINCT) cascades are not wired for join
  * views (`distincts` must be empty).
  *
  * CONTRACT: inner equi-join `leftKeys(i) = rightKeys(i)` (identical
  * types pairwise). The RIGHT side's key columns are renamed to the
  * LEFT names before the join (USING semantics — one key column set
  * in the joined shape, under the left names), which also makes the
  * reference's natural shape collision-free: orders.purchaser ⋈
  * customers.id renames customers.id away, so orders.id stays
  * unambiguous. Apart from the renamed keys, column names must be
  * disjoint across the two tables. `vdef` names columns of that
  * joined shape. The view reflects a VERSION PAIR, recorded in its
  * `_REFLECTS` marker as `vLeft,vRight`; the `_REFRESH_INTENT` crash
  * protocol is the single-table one with pair-valued from/to fields.
  * Exactly-once under at-least-once replay for the same reasons (a
  * replayed merge nets a zero feed; the intent disambiguates through
  * the view's own version history).
  */
object IncrementalJoinView {

  /** Join-view definition. `vdef.groupBy`/`sums`/... name columns of
    * the JOINED row shape (right-side keys appear under left names). */
  final case class JoinViewDef(left: String, leftPks: Seq[String],
      right: String, rightPks: Seq[String],
      leftKeys: Seq[String], rightKeys: Seq[String],
      view: String, vdef: ViewDef) {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "a join view needs pairwise equi-join keys")
    require(vdef.distincts.isEmpty,
      "COUNT(DISTINCT) cascades are not supported on join views")
  }

  /** The right side with its key columns renamed to the left names —
    * the normalization every join in this object goes through. */
  private def normRight(j: JoinViewDef, df: DataFrame): DataFrame =
    j.rightKeys.zip(j.leftKeys).foldLeft(df) { case (d, (r, l)) =>
      if (r == l) d else d.withColumnRenamed(r, l)
    }

  /** The joined snapshot at a pinned version pair — the initializer's
    * input and the drained-buffer rebuild base. Empty (schema-less)
    * when either side has no committed version. */
  private def snapshotJoin(store: ParquetTableStore, j: JoinViewDef,
      atLeft: String, atRight: String): DataFrame =
    if (atLeft.isEmpty || atRight.isEmpty) store.spark.emptyDataFrame
    else store.readVersion(j.left, atLeft)
      .join(normRight(j, store.readVersion(j.right, atRight)), j.leftKeys)

  /** One delta-join leg: the (cached, micro-batch-sized) signed feed
    * of one side joined against the OTHER side's pinned snapshot.
    * Both arrive normalized to the left key names. The feed
    * broadcasts; the snapshot read becomes a point lookup when the
    * feed's join-key values probe the snapshot table's merge PKs. */
  private def leg(store: ParquetTableStore, feed: DataFrame,
      otherTable: String, otherPks: Seq[String], otherAt: String,
      leftKeys: Seq[String], otherKeys: Seq[String],
      normalizeSnap: DataFrame => DataFrame): Option[DataFrame] = {
    if (otherAt.isEmpty) return None
    val snap =
      if (otherKeys == otherPks)
        store.readKeysPrunedAt(otherTable, otherAt, otherPks,
          feed.select(leftKeys.map(col): _*).distinct()
            .toDF(otherKeys: _*)).map(_._1)
          .getOrElse(return None)
      else store.readVersion(otherTable, otherAt)
    Some(normalizeSnap(snap).join(broadcast(feed), leftKeys))
  }

  /** Columns the maintenance machinery needs from the joined shape —
    * the prune that keeps the union legs narrow. A `where` predicate
    * may reference columns OUTSIDE the aggregate set, and its SQL text
    * is not parsed here: with a filter present the legs keep the full
    * joined shape instead (correctness over the narrow union; the
    * delta is micro-batch-sized either way). */
  private def feedColumns(vdef: ViewDef): Option[Seq[String]] =
    if (vdef.where.nonEmpty) None
    else Some((vdef.groupBy ++ vdef.sums ++ vdef.vars ++ vdef.mins ++
      vdef.maxs).distinct :+ "_change_type")

  /** One-shot (re)computation from pinned snapshots — initializer,
    * vacuum-recovery rebuild, and the spec's equality anchor. Returns
    * the reflected version pair. */
  def initialize(store: ParquetTableStore, j: JoinViewDef): (String, String) = {
    val atL = store.version(j.left).getOrElse("")
    val atR = store.version(j.right).getOrElse("")
    val snapshot = snapshotJoin(store, j, atL, atR)
    if (snapshot.columns.isEmpty) {
      // one (or both) bases empty: materialize view emptiness, record
      // the pair so a later refresh re-initializes when versions appear
      store.read(j.view).foreach { v =>
        store.applyChanges(j.view, j.vdef.groupBy,
          v.filter(lit(false)), v.select(j.vdef.groupBy.map(col): _*))
      }
      store.writeMarker(j.view, IncrementalView.ReflectsMarker, s"$atL,$atR")
      return (atL, atR)
    }
    val fresh = IncrementalView.compute(snapshot, j.vdef)
    val stale = store.read(j.view) match {
      case Some(v) => v.select(j.vdef.groupBy.map(col): _*)
        .join(fresh.select(j.vdef.groupBy.map(col): _*),
          j.vdef.groupBy, "left_anti")
      case None =>
        snapshot.select(j.vdef.groupBy.map(col): _*).filter(lit(false))
    }
    store.applyChanges(j.view, j.vdef.groupBy, fresh, stale)
    store.writeMarker(j.view, IncrementalView.ReflectsMarker, s"$atL,$atR")
    (atL, atR)
  }

  /** Advance the view to BOTH bases' current versions from wherever
    * the `_REFLECTS` pair says it stands — initializing on first call,
    * rebuilding when either reflected version has been vacuumed away,
    * recovering an interrupted refresh through the intent marker
    * (same disambiguation as the single-table protocol: if the view's
    * version moved past the intent's `viewBefore`, the merge
    * committed and the marker fast-forwards). */
  def refreshToCurrent(store: ParquetTableStore, j: JoinViewDef): Unit = {
    store.readMarker(j.view, IncrementalView.IntentMarker).foreach { intent =>
      intent.split("\t", 3) match {
        case Array(_, to, viewBefore)
            if viewBefore.isEmpty || viewBefore.endsWith(".manifest") =>
          if (store.version(j.view).getOrElse("") != viewBefore)
            store.writeMarker(j.view, IncrementalView.ReflectsMarker, to)
        case _ => // torn mid-write: merge never ran — no claim to honor
      }
      store.removeMarker(j.view, IncrementalView.IntentMarker)
    }
    store.readMarker(j.view, IncrementalView.ReflectsMarker) match {
      case None => initialize(store, j)
      case Some(pair) if !pair.contains(",") =>
        // not a version pair (a truncated legacy-fallback read can
        // surface a prefix): the safe direction is the rebuild the
        // absent-marker path takes
        initialize(store, j)
      case Some(pair) =>
        val Array(fromL, fromR) = pair.split(",", 2)
        val toL = store.version(j.left).getOrElse("")
        val toR = store.version(j.right).getOrElse("")
        if (toL != fromL || toR != fromR) {
          def gone(t: String, v: String, to: String): Boolean =
            v != to && (v.isEmpty || !store.versions(t).contains(v))
          if (gone(j.left, fromL, toL) || gone(j.right, fromR, toR))
            // a reflected version was vacuumed (or was the empty
            // sentinel): no feed span serves it — rebuild from current
            initialize(store, j)
          else {
            store.writeMarker(j.view, IncrementalView.IntentMarker,
              s"$fromL,$fromR\t$toL,$toR\t${store.version(j.view).getOrElse("")}")
            refresh(store, j, fromL, toL, fromR, toR)
            store.writeMarker(j.view,
              IncrementalView.ReflectsMarker, s"$toL,$toR")
            store.removeMarker(j.view, IncrementalView.IntentMarker)
          }
        }
    }
  }

  /** Advance the view from version pair (fromL, fromR) to (toL, toR)
    * reading ONLY the two change feeds and the two pinned snapshots
    * the algebra needs. Returns touched view groups. */
  def refresh(store: ParquetTableStore, j: JoinViewDef,
      fromL: String, toL: String, fromR: String, toR: String): Long = {
    val cols = feedColumns(j.vdef)
    // the feeds are cached: each feeds both the key-prune collect and
    // its leg's join (and the merge's two passes over the delta);
    // released after the merge action completes
    val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      // leg 1: ΔL ⋈ R@toR
      val legL =
        if (fromL == toL) None
        else {
          val feedL = store.changesBetween(j.left, j.leftPks, fromL, toL).cache()
          cached += feedL
          leg(store, feedL, j.right, j.rightPks, toR,
            j.leftKeys, j.rightKeys, normRight(j, _))
        }
      // leg 2: L@fromL ⋈ ΔR (the right feed arrives key-normalized)
      val legR =
        if (fromR == toR) None
        else {
          val feedR = normRight(j,
            store.changesBetween(j.right, j.rightPks, fromR, toR)).cache()
          cached += feedR
          leg(store, feedR, j.left, j.leftPks, fromL,
            j.leftKeys, j.leftKeys, identity)
        }
      val legs = (legL.toSeq ++ legR.toSeq)
        .map(df => cols.fold(df)(cs => df.select(cs.map(col): _*)))
      if (legs.isEmpty) return 0L
      // without the prune the two legs' column ORDERS differ (snapshot
      // side first vs feed side first) — unionByName aligns them
      val feed = legs.reduce(_.unionByName(_))
      IncrementalView.mergeDelta(store, j.view, j.vdef,
        IncrementalView.delta(feed, j.vdef),
        () => snapshotJoin(store, j, toL, toR))
    } finally cached.foreach(_.unpersist())
  }

  /** The view with derived consumer columns (avg/var/min/max scalars)
    * — the single-table read, minus the distinct cascade. */
  def read(store: ParquetTableStore, j: JoinViewDef): Option[DataFrame] =
    IncrementalView.read(store, j.view, j.vdef)
}
