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
  * touched view groups), the whole point of IVM.
  *
  * MIN/MAX (non-invertible under deletes) are maintained through a
  * bounded K-EXTREME BUFFER per (group, column) — the classic
  * auxiliary-structure move for non-self-maintainable aggregates: the
  * view stores each group's k smallest (resp. largest) values as an
  * exact-decimal array whose INVARIANT is "a prefix of the group's
  * sorted value multiset". Deleting the current extremum just removes
  * one occurrence from the prefix (stays a prefix); inserting a value
  * ≤ the buffer's last slots it in (prefix of length +1); an insert
  * ABOVE a non-full buffer's last is conservatively dropped (values
  * truncated away earlier could sit in between — the round's
  * counterexample: buffer [1,5] of group {1,5,5.5,7} must NOT absorb
  * a 6). Only when a group's buffer DRAINS while rows remain does
  * that group — and only that group — recompute from the base
  * snapshot at the refresh's target version: one semi-joined
  * aggregation, needed at most once per ≥K extremum deletions in a
  * single span. The buffers come from `functions.BottomKDec`, a
  * map-side-combinable bounded heap, so even (re)initialization
  * never materializes a group's full value list.
  *
  * COUNT(DISTINCT) (also non-invertible: the count moves only when a
  * group's LAST occurrence of a value dies or its first is born) is
  * maintained through a TWO-LEVEL CASCADE of this same machinery: a
  * count-only occurrence view grouped by (groupBy, c) follows the
  * base's change feed, and a count-only view over THAT view's own
  * recorded change feed counts its live rows per group — which is the
  * distinct count, exactly. Every leg reuses the marker/intent crash
  * protocol unchanged (exactly-once per leg), every leg is O(delta +
  * touched groups), and `read` joins the counts back as `nd_<c>`.
  */
object IncrementalView {

  /** View definition: group keys + columns maintained as exact sums,
    * plus columns maintained as min / max through `bufK`-element
    * exact-decimal extreme buffers, plus columns maintained as exact
    * per-group COUNT(DISTINCT) through a two-level view cascade (see
    * [[valsView]]). `where` restricts the view to base rows matching a
    * SQL predicate (applied identically to the snapshot and to every
    * feed image, so a row updated across the boundary enters/leaves
    * the view as an insert/delete). Changing a view's definition
    * requires re-`initialize` (the stored schema is the definition).
    *
    * `vars` columns are quantized to 5 decimal places for the exact
    * second moment and must fit ±10^13 — a wider value RAISES at
    * refresh time (never a silent NULL-drop); see [[sq]]. */
  final case class ViewDef(groupBy: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil, bufK: Int = 8,
      distincts: Seq[String] = Nil, where: Option[String] = None,
      vars: Seq[String] = Nil) {
    require(groupBy.nonEmpty, "a view needs at least one group-by column")
    require(bufK >= 1, "bufK must be positive")
    require(vars.forall(sums.contains),
      s"variance needs the first moment too — add ${vars.filterNot(sums.contains).mkString(", ")} to sums")
    def sumCol(c: String): String = s"sum_$c"
    def sum2Col(c: String): String = s"sum2_$c"
    def nnCol(c: String): String = s"nn_$c"
    def minbCol(c: String): String = s"minb_$c"
    def maxbCol(c: String): String = s"maxb_$c"
    def ndCol(c: String): String = s"nd_$c"
  }

  /** COUNT(DISTINCT c) is not self-maintainable under deletes (the
    * count moves only when a group's LAST occurrence of a value dies,
    * or its first is born) — the classic fix is an occurrence-count
    * auxiliary. Here the auxiliary IS another IncrementalView: a
    * count-only view grouped by (groupBy, c) maintained from the
    * base's change feed, whose own bucket-scoped merges RECORD a
    * change feed — and a second count-only view over THAT feed,
    * grouped by groupBy, counts the live (group, value) rows, which
    * is exactly the distinct count. Both legs reuse the
    * marker/intent crash protocol unchanged, so the cascade is
    * exactly-once per leg with no new atomicity machinery; each
    * refresh leg is O(delta + touched groups). */
  private[cdc] def valsView(view: String, c: String): String =
    s"${view}__vals_$c"
  private[cdc] def ndView(view: String, c: String): String =
    s"${view}__nd_$c"

  private[cdc] def auxDef(vdef: ViewDef, c: String): ViewDef = {
    val notNull = s"`$c` IS NOT NULL" // COUNT(DISTINCT) ignores nulls
    ViewDef(vdef.groupBy :+ c, Nil,
      where = Some(vdef.where.map(w => s"($w) AND $notNull")
        .getOrElse(notNull)))
  }

  private[cdc] def ndDef(vdef: ViewDef): ViewDef = ViewDef(vdef.groupBy, Nil)

  private def dec(c: String): String = s"CAST(`$c` AS DECIMAL(38,10))"

  /** The second moment's square is kept EXACT in decimal: inputs are
    * first narrowed to DECIMAL(18,5) so the product is DECIMAL(37,10)
    * — inside the 38-digit budget instead of tripping Spark's
    * precision-capping (which would silently round). VAR/STDDEV are
    * therefore maintainable under deletes as plain signed sums
    * (n, Σx, Σx²), with the textbook cancellation confined to the
    * derive-at-read edge.
    *
    * THE NARROWING IS GUARDED, NOT SILENT: a value outside ±10^13 (the
    * DECIMAL(18,5) range) would cast to NULL under non-ANSI semantics
    * and quietly drop out of Σx², corrupting var_/stddev_ with no
    * error — so the cast raises through `raise_error` instead. A value
    * with MORE than 5 decimal places does quantize (documented on
    * [[ViewDef.vars]]): variance is a second-moment statistic and 5 dp
    * of input precision bounds the Σx² error far below the double
    * conversion at the read edge; callers needing wider scale belong
    * in a custom buffer, not a silent wider cast that would overflow
    * the 38-digit product budget. */
  private def sq(c: String): String = {
    val d = s"CAST(`$c` AS DECIMAL(18,5))"
    val guarded = s"""CASE
      | WHEN `$c` IS NULL THEN CAST(NULL AS DECIMAL(18,5))
      | WHEN $d IS NULL THEN CAST(raise_error(CONCAT(
      |   'IncrementalView vars column `$c` value ', CAST(`$c` AS STRING),
      |   ' exceeds the DECIMAL(18,5) moment range (±10^13 at 5 dp)'))
      |   AS DECIMAL(18,5))
      | ELSE $d END""".stripMargin
    s"($guarded * $guarded)"
  }

  /** One-shot (re)computation of the view from a base snapshot — the
    * initializer, the rebuild path, and the spec's equality anchor.
    *
    * STORED MOMENT CONVENTION: sums (and second moments) are stored
    * ZERO-BASED (`coalesce(sum, 0)`) with a per-column NON-NULL count
    * `nn_<c>` alongside. Signed-delta arithmetic needs this: SQL's
    * `SUM` returns NULL over an all-null set, but `stored + Δ` can
    * only stay exact when both operands are numbers (a pure-null
    * micro-batch delta would otherwise NULL the whole accumulator,
    * and a group whose last non-null value dies would show 0 where
    * SQL says NULL). `nn` is itself a signed count, so the SQL
    * surface is derived exactly at the READ edge: sum is NULL iff
    * nn = 0, AVG/VAR divide by nn (null-skipping), never by n. */
  def compute(base: DataFrame, vdef: ViewDef): DataFrame = {
    graft.functions.BottomKDec.register(base.sparkSession)
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,10)")
    vdef.where.map(w => base.filter(expr(w))).getOrElse(base)
      .groupBy(vdef.groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        (vdef.sums.map(c => coalesce(
          sum(col(c).cast("decimal(38,10)")), zero).as(vdef.sumCol(c))) ++
         vdef.sums.map(c => count(col(c)).as(vdef.nnCol(c))) ++
         vdef.vars.map(c => coalesce(
          sum(expr(sq(c))).cast("decimal(38,10)"), zero).as(vdef.sum2Col(c))) ++
         vdef.mins.map(c => expr(
           s"bottomk_dec(${dec(c)}, ${vdef.bufK}, false)").as(vdef.minbCol(c))) ++
         vdef.maxs.map(c => expr(
           s"bottomk_dec(${dec(c)}, ${vdef.bufK}, true)").as(vdef.maxbCol(c)))): _*)
  }

  /** Signed per-group delta of a change feed slice. For min/max
    * columns the delta carries four bounded arrays per column: the K
    * smallest / largest INSERTED and DELETED values — K suffices on
    * the delete side because hits on a length-L ≤ K buffer sort
    * before misses, and ≥ L hits drain the buffer into the rebuild
    * path regardless of what the un-kept deletes were. */
  private[cdc] def delta(feed: DataFrame, vdef: ViewDef): DataFrame = {
    graft.functions.BottomKDec.register(feed.sparkSession)
    val sgn = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val k = vdef.bufK
    vdef.where.map(w => feed.filter(expr(w))).getOrElse(feed)
      .withColumn("_sgn", sgn)
      .groupBy(vdef.groupBy.map(col): _*)
      .agg(sum(col("_sgn")).as("_dn"),
        (vdef.sums.map(c => coalesce(sum(col("_sgn") *
          col(c).cast("decimal(38,10)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,10)"))
          .as(s"_d_$c")) ++
         vdef.sums.map(c => sum(when(col(c).isNotNull, col("_sgn"))
           .otherwise(0L)).as(s"_dnn_$c")) ++
         vdef.vars.map(c => coalesce(sum(col("_sgn") * expr(sq(c)))
           .cast("decimal(38,10)"),
           lit(java.math.BigDecimal.ZERO).cast("decimal(38,10)"))
           .as(s"_d2_$c")) ++
         vdef.mins.flatMap(c => Seq(
           expr(s"bottomk_dec(CASE WHEN _sgn = 1 THEN ${dec(c)} END, $k, false)")
             .as(s"_i_min_$c"),
           expr(s"bottomk_dec(CASE WHEN _sgn = -1 THEN ${dec(c)} END, $k, false)")
             .as(s"_x_min_$c"))) ++
         vdef.maxs.flatMap(c => Seq(
           expr(s"bottomk_dec(CASE WHEN _sgn = 1 THEN ${dec(c)} END, $k, true)")
             .as(s"_i_max_$c"),
           expr(s"bottomk_dec(CASE WHEN _sgn = -1 THEN ${dec(c)} END, $k, true)")
             .as(s"_x_max_$c")))): _*)
  }

  /** The buffer fold for one min (asc=true) or max column: remove one
    * occurrence per hitting delete (position-splice — `array_remove`
    * drops ALL occurrences, wrong for multisets), then admit inserts
    * that land at or inside the buffer's last element. New groups
    * (no current row) take the inserted-side buffer whole: the group
    * IS the inserts, so that buffer is complete by construction. */
  private def bufMerge(vdef: ViewDef, c: String, asc: Boolean): Column = {
    val (buf, ins, del, cmp, sortArgs) =
      if (asc) (vdef.minbCol(c), s"_i_min_$c", s"_x_min_$c", "<=", "")
      else (vdef.maxbCol(c), s"_i_max_$c", s"_x_max_$c", ">=", ", false")
    val afterDel =
      s"""aggregate(`$del`, `$buf`, (acc, d) ->
         |  CASE WHEN array_position(acc, d) > 0
         |    THEN concat(slice(acc, 1, array_position(acc, d) - 1),
         |                slice(acc, array_position(acc, d) + 1, size(acc)))
         |    ELSE acc END)""".stripMargin
    val afterIns =
      s"""aggregate(`$ins`, $afterDel, (acc, v) ->
         |  CASE WHEN size(acc) > 0 AND v $cmp element_at(acc, size(acc))
         |    THEN slice(sort_array(concat(acc, array(v))$sortArgs), 1, ${vdef.bufK})
         |    ELSE acc END)""".stripMargin
    when(col("n").isNull, col(ins)).otherwise(expr(afterIns)).as(buf)
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
    * and record which base version it reflects. The version is
    * resolved ONCE through the _LATEST pointer (`store.version` —
    * never `versions().last`, which can name a manifest orphaned by a
    * crashed merge) and the snapshot is derived FROM it
    * (`readVersion(base, at)`): resolving pointer and content
    * separately would let a base merge committing between the two
    * reads make the `_REFLECTS` marker claim a version newer than the
    * aggregated snapshot, silently skipping that window's changes in
    * every later refresh.
    *
    * An EMPTY base (every row deleted — a valid manifest with a live
    * pointer and no buckets) initializes to an empty view: all
    * existing view groups are deleted and the marker still records the
    * version, so a later refresh picks up from it normally. */
  def initialize(store: ParquetTableStore, base: String, view: String,
      vdef: ViewDef): String = {
    // "" = the base has no committed version at all (e.g. a distinct-
    // cascade aux table over an empty base that never materialized a
    // merge) — a valid empty state, recorded as the sentinel so a
    // later refresh re-initializes the moment a real version appears
    val at = store.version(base).getOrElse("")
    val snapshot =
      if (at.isEmpty) store.spark.emptyDataFrame
      else store.readVersion(base, at)
    if (snapshot.columns.isEmpty) {
      // empty manifest: no schema to aggregate — materialize emptiness
      store.read(view).foreach { v =>
        store.applyChanges(view, vdef.groupBy, v.filter(lit(false)),
          v.select(vdef.groupBy.map(col): _*))
      }
      store.writeMarker(view, ReflectsMarker, at)
      initializeDistincts(store, base, view, vdef)
      return at
    }
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
    initializeDistincts(store, base, view, vdef)
    at
  }

  /** Initialize the COUNT(DISTINCT) cascade: one occurrence view per
    * column over the base, one count view over each occurrence view.
    * Each leg may read the base slightly ahead of the main view's
    * snapshot under a concurrent base writer; the single-writer
    * refresh loop (MirrorPipeline's stance) keeps all legs aligned at
    * every quiescent point. */
  private def initializeDistincts(store: ParquetTableStore, base: String,
      view: String, vdef: ViewDef): Unit =
    vdef.distincts.foreach { c =>
      initialize(store, base, valsView(view, c), auxDef(vdef, c))
      initialize(store, valsView(view, c), ndView(view, c), ndDef(vdef))
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
    // recover a refresh interrupted between merge and marker. A
    // legacy (pre-terminator) intent read can in principle surface a
    // TRUNCATED current-format write (cut before its first newline),
    // so the claim is only honored when its shape validates: exactly
    // three fields with a well-formed viewBefore (empty = the view
    // had no version yet, else a manifest name). A malformed intent
    // means the crash happened DURING the intent write — before the
    // merge — so discarding it is the correct direction.
    store.readMarker(view, IntentMarker).foreach { intent =>
      intent.split("\t", 3) match {
        case Array(_, to, viewBefore)
            if viewBefore.isEmpty || viewBefore.endsWith(".manifest") =>
          if (store.version(view).getOrElse("") != viewBefore)
            store.writeMarker(view, ReflectsMarker, to) // merge committed
        case _ => // torn mid-write: merge never ran — no claim to honor
      }
      store.removeMarker(view, IntentMarker)
    }
    store.readMarker(view, ReflectsMarker) match {
      case None => initialize(store, base, view, vdef)
      case Some(from) =>
        val to = store.version(base).getOrElse("")
        if (to != from) {
          if (from.isEmpty || !store.versions(base).contains(from) ||
              // marker present but the view never materialized a
              // version: it was initialized over an empty/schema-less
              // base — nothing to merge a delta into, re-initialize
              store.version(view).isEmpty)
            // `from` vacuumed (or the base materialized its first
            // version since the empty-sentinel init): neither recorded
            // span nor snapshot diff can serve it — rebuild from the
            // current snapshot
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
    // the COUNT(DISTINCT) cascade advances leg by leg, each with its
    // own marker/intent protocol — a crash resumes whichever leg was
    // interrupted, exactly once (initialize above already seeded the
    // legs; these are no-ops when already current)
    vdef.distincts.foreach { c =>
      refreshToCurrent(store, base, basePks,
        valsView(view, c), auxDef(vdef, c))
      refreshToCurrent(store, valsView(view, c), vdef.groupBy :+ c,
        ndView(view, c), ndDef(vdef))
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
    mergeDelta(store, view, vdef, delta(feed, vdef),
      () => store.readVersion(base, toVersion))
  }

  /** Merge a signed per-group delta (the shape [[delta]] produces)
    * into the view — the leg every maintenance path shares (single-
    * table refresh above; [[IncrementalJoinView]] feeds it the
    * delta-join's signed feed). `rebuildSnapshot` supplies the base
    * state groups recompute from when a min/max buffer drains; join
    * views pass their joined snapshot. Returns touched group count. */
  private[cdc] def mergeDelta(store: ParquetTableStore, view: String,
      vdef: ViewDef, rawDelta: DataFrame,
      rebuildSnapshot: () => DataFrame): Long = {
    val d = rawDelta.cache()
    try {
      val nDelta = d.count() // one action both gates and reports
      if (nDelta == 0L) return 0L
      val cur = store.read(view).getOrElse {
        if (store.version(view).isEmpty)
          throw new IllegalStateException(
            s"view '$view' not initialized — call initialize first")
        // committed but EMPTY manifest — every group deleted in some
        // earlier refresh (or an initialize over an empty base). That
        // is a valid empty view, not an uninitialized one; the store
        // reads it as None (no buckets, no schema), so synthesize the
        // maintained shape from the delta's group columns
        val base = d.select(vdef.groupBy.map(col): _*).limit(0)
          .withColumn("n", lit(0L))
        val s1 = vdef.sums.foldLeft(base)((df, c) => df
          .withColumn(vdef.sumCol(c), lit(null).cast("decimal(38,10)"))
          .withColumn(vdef.nnCol(c), lit(null).cast("long")))
        val s2 = vdef.vars.foldLeft(s1)((df, c) => df
          .withColumn(vdef.sum2Col(c), lit(null).cast("decimal(38,10)")))
        val s3 = vdef.mins.foldLeft(s2)((df, c) => df
          .withColumn(vdef.minbCol(c), lit(null).cast("array<decimal(38,10)>")))
        vdef.maxs.foldLeft(s3)((df, c) => df
          .withColumn(vdef.maxbCol(c), lit(null).cast("array<decimal(38,10)>")))
      }
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
              .cast("decimal(38,10)").as(vdef.sumCol(c))) ++
          vdef.sums.map(c =>
            (coalesce(col(vdef.nnCol(c)), lit(0L)) + col(s"_dnn_$c"))
              .as(vdef.nnCol(c))) ++
          vdef.vars.map(c =>
            (coalesce(col(vdef.sum2Col(c)), zero) + col(s"_d2_$c"))
              .cast("decimal(38,10)").as(vdef.sum2Col(c))) ++
          vdef.mins.map(c => bufMerge(vdef, c, asc = true)) ++
          vdef.maxs.map(c => bufMerge(vdef, c, asc = false)): _*)
      val live = merged.filter(col("n") > 0)
      val deletes = merged.filter(col("n") <= 0)
        .select(vdef.groupBy.map(col): _*)
      // a drained buffer on a still-populated group = the prefix can
      // no longer answer min/max — recompute THOSE groups (only) from
      // the base snapshot this refresh targets
      val drained = (vdef.mins.map(c => size(col(vdef.minbCol(c))) === 0) ++
        vdef.maxs.map(c => size(col(vdef.maxbCol(c))) === 0))
        .reduceOption(_ || _).getOrElse(lit(false))
      if (vdef.mins.isEmpty && vdef.maxs.isEmpty)
        store.applyChanges(view, vdef.groupBy, live, deletes)
      else {
        val rebuildKeys = live.filter(drained)
          .select(vdef.groupBy.map(col): _*).cache()
        try {
          val upserts =
            if (rebuildKeys.isEmpty) live
            else {
              val baseAt = rebuildSnapshot()
              val rebuilt = compute(
                baseAt.join(rebuildKeys, vdef.groupBy, "left_semi"), vdef)
              live.filter(!drained).unionByName(rebuilt)
            }
          store.applyChanges(view, vdef.groupBy, upserts, deletes)
        } finally rebuildKeys.unpersist()
      }
      nDelta
    } finally d.unpersist()
  }

  /** The view with derived consumer columns and SQL null semantics
    * restored at the edge: sum_<c> reads NULL when the group holds no
    * non-null value (the stored accumulator is zero-based — see
    * [[compute]]), avg = exact sum / nn (AVG skips nulls; double only
    * at the edge), min_/max_ scalars = head of each extreme buffer
    * (exact decimals; the buffers stay visible for callers that audit
    * prefix health), var/stddev over the NON-NULL count (VAR_SAMP
    * semantics: null below nn = 2), and nd_<c> = exact
    * COUNT(DISTINCT c) joined in from the cascade's count view (0 for
    * groups whose every value is null). */
  def read(store: ParquetTableStore, view: String,
      vdef: ViewDef): Option[DataFrame] =
    store.read(view).map { v =>
      val withSum = vdef.sums.foldLeft(v) { (df, c) =>
        // legacy rows (pre-nn) carry NULL nn: treat as "unknown, keep
        // the stored sum" rather than forcing NULL
        df.withColumn(vdef.sumCol(c),
          when(col(vdef.nnCol(c)) === 0,
            lit(null).cast("decimal(38,10)"))
            .otherwise(col(vdef.sumCol(c))))
      }
      val withAvg = vdef.sums.foldLeft(withSum) { (df, c) =>
        df.withColumn(s"avg_$c",
          (col(vdef.sumCol(c)) /
            coalesce(col(vdef.nnCol(c)), col("n"))).cast("double"))
      }
      // sample variance / stddev derived from the exact moments at the
      // read edge (double only here; null below nn = 2, like VAR_SAMP)
      val withVar = vdef.vars.foldLeft(withAvg) { (df, c) =>
        val nn = coalesce(col(vdef.nnCol(c)), col("n"))
        val nnd = nn.cast("double")
        val s1 = coalesce(col(vdef.sumCol(c)), lit(0)).cast("double")
        val s2 = col(vdef.sum2Col(c)).cast("double")
        df.withColumn(s"var_$c",
            when(nn >= 2, greatest((s2 - s1 * s1 / nnd) / (nnd - 1), lit(0.0))))
          .withColumn(s"stddev_$c", sqrt(col(s"var_$c")))
      }
      // try_element_at: a group whose every value is null (an outer
      // join's fully null-extended group) keeps an EMPTY buffer — its
      // min/max read NULL (SQL semantics), not an ANSI index error
      val withMin = vdef.mins.foldLeft(withVar) { (df, c) =>
        df.withColumn(s"min_$c",
          expr(s"try_element_at(`${vdef.minbCol(c)}`, 1)"))
      }
      val withMax = vdef.maxs.foldLeft(withMin) { (df, c) =>
        df.withColumn(s"max_$c",
          expr(s"try_element_at(`${vdef.maxbCol(c)}`, 1)"))
      }
      vdef.distincts.foldLeft(withMax) { (df, c) =>
        val nd = store.read(ndView(view, c)) match {
          case Some(t) => t.select(vdef.groupBy.map(col) :+
            col("n").as(vdef.ndCol(c)): _*)
          case None => df.select(vdef.groupBy.map(col): _*)
            .limit(0).withColumn(vdef.ndCol(c), lit(0L))
        }
        df.join(nd, vdef.groupBy, "left")
          .withColumn(vdef.ndCol(c), coalesce(col(vdef.ndCol(c)), lit(0L)))
      }
    }
}
