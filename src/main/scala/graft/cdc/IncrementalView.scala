package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a mirrored table,
  * fed by the store's change data feed — the classic IVM move
  * (delta-propagation for distributive aggregates) composed from the
  * pieces this engine already has: `changesBetween` supplies signed
  * deltas, the view itself lives in the SAME `ParquetTableStore`
  * keyed by its group-by columns, and `applyChanges` lands the merge
  * bucket-scoped.
  *
  * Maintained shape: GROUP BY `groupBy` with `n = count(*)` and one
  * exact decimal `sum_<c>` per configured column. Each feed row
  * contributes with sign +1 (`insert` / `update_postimage`) or −1
  * (`delete` / `update_preimage`); update rows therefore cancel
  * exactly across their pre/post images when the grouping key is
  * unchanged and MOVE the row between groups when it changed. Sums
  * accumulate as DECIMAL(38,10) — order-independent and exact, so a
  * view refreshed a thousand times equals the one-shot aggregation
  * bit-for-bit (the engine-wide exact-accumulator stance; a double
  * accumulator would drift per refresh). Groups whose count reaches
  * zero are DELETED from the view, not left as ghost rows.
  *
  * Scale: a refresh never rescans the base table — it reads the
  * version diff (bucket-pruned to manifests' differing entries), one
  * keyed aggregation over the delta, one keyed join against the
  * current view, and a bucket-scoped view merge. Cost is O(delta +
  * touched view groups), the whole point of IVM. Non-invertible
  * aggregates (min/max) are deliberately out: under deletes they
  * need touched-group recompute against the base; recompute those
  * groups with a filtered batch aggregation instead.
  */
object IncrementalView {

  /** View definition: group keys + columns maintained as exact sums. */
  final case class ViewDef(groupBy: Seq[String], sums: Seq[String]) {
    require(groupBy.nonEmpty, "a view needs at least one group-by column")
    def sumCol(c: String): String = s"sum_$c"
  }

  /** One-shot (re)computation of the view from a base snapshot — the
    * initializer, and the spec's equality anchor. */
  def compute(base: DataFrame, vdef: ViewDef): DataFrame =
    base.groupBy(vdef.groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        vdef.sums.map(c =>
          sum(col(c).cast("decimal(38,10)")).as(vdef.sumCol(c))): _*)

  /** Signed per-group delta of a change feed slice. */
  private def delta(feed: DataFrame, vdef: ViewDef): DataFrame = {
    val sgn = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    feed.withColumn("_sgn", sgn)
      .groupBy(vdef.groupBy.map(col): _*)
      .agg(sum(col("_sgn")).as("_dn"),
        vdef.sums.map(c => sum(col("_sgn") *
          col(c).cast("decimal(38,10)")).as(s"_d_$c")): _*)
  }

  /** Marker file in the view's table dir recording the base version
    * the view currently reflects — what makes [[refreshToCurrent]]
    * restart-safe in a foreachBatch. */
  val ReflectsMarker = "_REFLECTS"

  /** Crash-window intent marker: `from \t to \t viewVersionBefore`,
    * written atomically BEFORE a refresh merges. The view merge and
    * the `_REFLECTS` update cannot commit atomically together on a
    * plain filesystem, so recovery disambiguates through the view's
    * OWN version history: if the view's current version still equals
    * `viewVersionBefore`, the merge never committed and the intent is
    * discarded; if it moved, the merge committed and `_REFLECTS`
    * fast-forwards to `to`. Either way the interrupted refresh is
    * applied exactly once. */
  val IntentMarker = "_REFRESH_INTENT"

  /** Initialize the materialized view from the base's CURRENT content
    * and record which base version it reflects. Reads the version
    * through the _LATEST pointer (`store.version`) — never
    * `versions().last`, which can name a manifest orphaned by a
    * crashed merge that `read` does not serve. */
  def initialize(store: ParquetTableStore, base: String, view: String,
      vdef: ViewDef): String = {
    val snapshot = store.read(base).getOrElse(
      throw new IllegalStateException(s"base table '$base' is empty"))
    val at = store.version(base).get // the version `snapshot` reflects
    val fresh = compute(snapshot, vdef)
    // RE-initialization (vacuum recovery) merges over an existing
    // view: groups that vanished from the base must be deleted, or
    // applyChanges would leave them as ghost rows
    val stale = store.read(view) match {
      case Some(v) => v.select(vdef.groupBy.map(col): _*)
        .join(fresh.select(vdef.groupBy.map(col): _*),
          vdef.groupBy, "left_anti")
      case None => emptyKeys(snapshot, vdef)
    }
    store.applyChanges(view, vdef.groupBy, fresh, stale)
    store.writeMarker(view, ReflectsMarker, at)
    at
  }

  /** Advance the view to the base's CURRENT version, from wherever
    * the `_REFLECTS` marker says it stands — initializing on first
    * call. Safe under at-least-once foreachBatch replay (a replayed
    * micro-batch re-merges identical content, so the new version's
    * change feed nets to zero and the refresh no-ops), under a crash
    * between the view merge and the marker update (the
    * [[IntentMarker]] protocol recovers it exactly once), and when
    * the marker's version has been VACUUMED away (no feed span and no
    * old manifest remain — the view re-initializes from the current
    * snapshot, the only state that still exists). */
  def refreshToCurrent(store: ParquetTableStore, base: String,
      basePks: Seq[String], view: String, vdef: ViewDef): Unit = {
    // recover a refresh interrupted between merge and marker
    store.readMarker(view, IntentMarker).foreach { intent =>
      val Array(_, to, viewBefore) = intent.split("\t", 3)
      if (store.version(view).getOrElse("") != viewBefore)
        store.writeMarker(view, ReflectsMarker, to) // merge committed
      store.removeMarker(view, IntentMarker)
    }
    store.readMarker(view, ReflectsMarker) match {
      case None => initialize(store, base, view, vdef)
      case Some(from) =>
        val to = store.version(base).getOrElse(
          throw new IllegalStateException(s"base table '$base' is empty"))
        if (to != from) {
          if (!store.versions(base).contains(from))
            // `from` vacuumed: neither recorded span nor snapshot diff
            // can serve it — rebuild from the current snapshot
            initialize(store, base, view, vdef)
          else {
            store.writeMarker(view, IntentMarker,
              s"$from\t$to\t${store.version(view).getOrElse("")}")
            refresh(store, base, basePks, view, vdef, from, to)
            store.writeMarker(view, ReflectsMarker, to)
            store.removeMarker(view, IntentMarker)
          }
        }
    }
  }

  private def emptyKeys(like: DataFrame, vdef: ViewDef): DataFrame =
    like.select(vdef.groupBy.map(col): _*).filter(lit(false))

  /** Advance the view from the base state it reflects (`fromVersion`)
    * to `toVersion`, reading ONLY the change feed. Returns the number
    * of view groups touched (0 = the diff was empty). */
  def refresh(store: ParquetTableStore, base: String, basePks: Seq[String],
      view: String, vdef: ViewDef,
      fromVersion: String, toVersion: String): Long = {
    val feed = store.changesBetween(base, basePks, fromVersion, toVersion)
    val d = delta(feed, vdef).cache()
    try {
      if (d.isEmpty) return 0L
      val cur = store.read(view).getOrElse(
        throw new IllegalStateException(
          s"view '$view' not initialized — call initialize first"))
      // keyed outer join view×delta: groups only in the delta are new,
      // groups only in the view pass through untouched only because
      // applyChanges merges — so restrict to TOUCHED groups and let the
      // bucket merge leave the rest alone
      val touched = cur.join(d, vdef.groupBy, "right_outer")
      val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,10)")
      val merged = touched.select(
        (vdef.groupBy.map(col) :+
          (coalesce(col("n"), lit(0L)) + col("_dn")).as("n")) ++
          vdef.sums.map(c =>
            (coalesce(col(vdef.sumCol(c)), zero) + col(s"_d_$c"))
              .cast("decimal(38,10)").as(vdef.sumCol(c))): _*)
      val upserts = merged.filter(col("n") > 0)
      val deletes = merged.filter(col("n") <= 0)
        .select(vdef.groupBy.map(col): _*)
      store.applyChanges(view, vdef.groupBy, upserts, deletes)
      d.count()
    } finally d.unpersist()
  }

  /** The view with derived means, for consumers (avg = exact sum / n,
    * emitted as double only at the edge). */
  def read(store: ParquetTableStore, view: String,
      vdef: ViewDef): Option[DataFrame] =
    store.read(view).map { v =>
      vdef.sums.foldLeft(v) { (df, c) =>
        df.withColumn(s"avg_$c",
          (col(vdef.sumCol(c)) / col("n")).cast("double"))
      }
    }
}
