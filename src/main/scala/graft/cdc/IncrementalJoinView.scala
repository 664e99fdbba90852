package graft.cdc

import graft.cdc.IncrementalView.ViewDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}

/** Incremental maintenance of views that JOIN TWO mirrored tables —
  * the classic delta-join algebra folded into the signed-delta group
  * machinery `IncrementalView` already has. The reference's mirror
  * feeds exactly this downstream shape (orders ⋈ customers revenue
  * rollups over the Postgres sink tables).
  *
  * ALGEBRA (inner). For J = A ⋈ B (equi-join) with A advancing
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
  * ALGEBRA (outer). J = A ⟕ B decomposes as A ⋈ B + NE(A, B) where
  * NE null-extends the A rows whose key is absent from B. NE is
  * linear in A under signed multisets, so
  *
  *   ΔNE = NE(ΔA, B@toB)  ∪  NE(A@fromA, B@toB) − NE(A@fromA, B@fromB)
  *
  * Leg 3 is ΔA anti-joined against B@toB's keys, null-extended with
  * ΔA's own signs. Leg 4 is the MATCH-COUNT TRANSITION leg: for each
  * join key touched by ΔB, m₁ = B@toB's row count at that key and
  * m₀ = m₁ − Σ(ΔB signs); keys crossing zero (m₀>0 xor m₁>0) emit
  * the null-extended A@fromA rows at that key with sign +1 when
  * matches vanished (the null-extended class is born) and −1 when
  * the first match appeared (it retracts). Keys whose zero-status is
  * unchanged contribute nothing — the count never has to be STORED,
  * it is recomputed per refresh from the (micro-batch-sized) touched
  * key set, a point lookup when the join keys are B's merge PKs.
  *
  * RIGHT OUTER mirrors the same two legs with every role swapped
  * (NE(ΔB, A@toA) + the LEFT-count transition emitting null-extended
  * B@fromB rows); FULL OUTER is the sum of both NE families —
  * J = A⋈B + NEₐ + NE_b with each family's delta derived against the
  * other side's pinned versions exactly as above, so the six legs
  * remain independent signed contributions to one feed. In the
  * normalized joined shape the join-key columns are never null under
  * any outer type (an NE row carries the key of whichever side
  * exists — the USING-join coalesce), which is what keeps group keys
  * on the join keys merge-safe.
  *
  * COUNT(DISTINCT) rides join views as the same TWO-LEVEL CASCADE the
  * single-table views use (IncrementalView.scala:91): the per-column
  * occurrence view grouped by (groupBy, c) is ITSELF an incremental
  * join view (count-only, same bases/keys/joinType, where-augmented
  * with `c IS NOT NULL`), and a single-table count view over THAT
  * view's own recorded change feed is the distinct count, exactly.
  * Every leg keeps its own marker/intent crash protocol — exactly
  * once per leg, O(delta + touched groups) per leg, zero new
  * atomicity machinery.
  *
  * SCALE. The deltas are micro-batch-sized and ride BROADCAST into
  * both legs; the snapshot sides never shuffle. When a leg's join
  * keys are the snapshot table's merge PKs (orders ⋈ customers on
  * customers' PK), the snapshot read is a `readKeysPrunedAt` POINT
  * LOOKUP — only the buckets hosting the delta's keys open,
  * regardless of table size. Otherwise the leg is one pruned-column
  * scan of that snapshot with a broadcast delta — per REFRESH, never
  * per row (the classic IVM cost model with and without an index).
  * The outer-join legs add one key-sized count probe and one pruned
  * A@fromA lookup, both bounded by the delta's key set. Refresh
  * cost: O(Δ · join fan-out + touched view groups).
  *
  * SUPPORTED AGGREGATES: n, sums, vars, mins/maxs (the K-extreme
  * buffers rebuild from the JOINED snapshot at the target versions
  * when drained), and distincts (the cascade above). Under
  * `left_outer`, aggregates over right-side columns see NULL on the
  * null-extended rows — exactly the SQL left-join semantics (`sum`
  * skips them, `n` counts them, COUNT(DISTINCT) ignores them).
  *
  * CONTRACT: equi-join `leftKeys(i) = rightKeys(i)` (identical types
  * pairwise), joinType `inner` (default), `left_outer`, `right_outer`
  * or `full_outer`. The RIGHT
  * side's key columns are renamed to the LEFT names before the join
  * (USING semantics — one key column set in the joined shape, under
  * the left names), which also makes the reference's natural shape
  * collision-free: orders.purchaser ⋈ customers.id renames
  * customers.id away, so orders.id stays unambiguous. Apart from the
  * renamed keys, column names must be disjoint across the two tables
  * — VALIDATED whenever both schemas are readable, so a collision
  * fails at the JoinViewDef boundary instead of as an
  * ambiguous-column analysis error mid-refresh. `vdef` names columns
  * of that joined shape. The view reflects a VERSION PAIR, recorded
  * in its `_REFLECTS` marker as `vLeft,vRight`; the
  * `_REFRESH_INTENT` crash protocol is the single-table one with
  * pair-valued from/to fields. Exactly-once under at-least-once
  * replay for the same reasons (a replayed merge nets a zero feed;
  * the intent disambiguates through the view's own version history).
  * A view (inner or outer) materializes once BOTH bases have a
  * committed version — a left-outer view's null extension needs the
  * right schema, so an absent right side keeps the view empty, and
  * the first refresh after it appears re-initializes.
  */
object IncrementalJoinView {

  /** Join-view definition. `vdef.groupBy`/`sums`/... name columns of
    * the JOINED row shape (right-side keys appear under left names;
    * `rightRename` aliases right NON-KEY columns first — the escape
    * hatch when a right column collides with a left name or with the
    * key rename target, e.g. customers ⟕ orders where orders.id must
    * step aside for purchaser→id). */
  final case class JoinViewDef(left: String, leftPks: Seq[String],
      right: String, rightPks: Seq[String],
      leftKeys: Seq[String], rightKeys: Seq[String],
      view: String, vdef: ViewDef, joinType: String = "inner",
      rightRename: Map[String, String] = Map.empty) {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      "a join view needs pairwise equi-join keys")
    require(Set("inner", "left_outer", "right_outer", "full_outer")
        .contains(joinType),
      s"unsupported join view joinType '$joinType' " +
        "(inner | left_outer | right_outer | full_outer)")
    require(rightKeys.forall(k => !rightRename.contains(k)),
      "rightRename aliases non-key columns; join keys rename to the " +
        "left names automatically")
    /** Unmatched LEFT rows survive null-extended (right columns null). */
    private[cdc] def neLeft: Boolean =
      joinType == "left_outer" || joinType == "full_outer"
    /** Unmatched RIGHT rows survive null-extended (left columns null). */
    private[cdc] def neRight: Boolean =
      joinType == "right_outer" || joinType == "full_outer"
    private[cdc] def outer: Boolean = joinType != "inner"
  }

  /** N-WAY JOIN VIEWS BY COMPOSITION: a chain of [[JoinViewDef]]s in
    * which each later view's LEFT "table" is the PREVIOUS view's
    * materialized output — legal because `applyChanges` records a
    * change feed for EVERY store table, views included, so a
    * maintained view is a first-class delta source for the next view
    * (the distinct cascade's move, generalized across joins). A 3-way
    * customer ⋈ orders ⋈ items rollup is a 2-link chain: link 1
    * materializes the ROW-LEVEL joined relation (groupBy = the left
    * PK plus the passthrough columns the next link needs — each group
    * is one joined row, n = 1), link 2 joins the third table against
    * that view's feed and aggregates. Refresh order is upstream-first
    * (the chain-typed `refreshToCurrent` walks the links;
    * MirrorPipeline's `joinViews` refresh in declaration order, so
    * passing `chain.defs` rides the stream).
    * Each link keeps its OWN marker/intent crash protocol — a crash
    * between links resumes exactly-once per leg, the upstream simply
    * running ahead until the next refresh catches the downstream up.
    * Cost per refresh stays O(Δ · fan-out + touched groups) PER LINK;
    * the intermediate view is base-sized only when the rollup
    * genuinely needs row-level composition (it is the classic IVM
    * delta-join tree, materialized one binary join at a time).
    * JoinViewIvmSpec pins the 3-way rollup recompute-exact under
    * 25-round churn on all three tables, riding MirrorPipeline. */
  final case class JoinViewChain(defs: Seq[JoinViewDef]) {
    require(defs.nonEmpty, "a chain needs at least one join view")
    defs.sliding(2).foreach {
      case Seq(up, down) =>
        require(down.left == up.view,
          s"chain break: '${down.view}' reads left table '${down.left}' " +
            s"but the previous link materializes '${up.view}'")
        require(down.leftPks == up.vdef.groupBy,
          s"chain break: '${down.view}' declares leftPks " +
            s"${down.leftPks.mkString(",")} but '${up.view}' is keyed by " +
            s"its groupBy ${up.vdef.groupBy.mkString(",")}")
      case _ => // single link — nothing to validate
    }
  }

  /** Advance every link of the chain, upstream first — each link's
    * own `refreshToCurrent` crash protocol applies unchanged. */
  def refreshToCurrent(store: ParquetTableStore, chain: JoinViewChain): Unit =
    chain.defs.foreach(refreshToCurrent(store, _))

  /** The chain's final rollup with derived consumer columns. */
  def read(store: ParquetTableStore, chain: JoinViewChain): Option[DataFrame] =
    read(store, chain.defs.last)

  /** The occurrence view of the distinct cascade: the SAME join, one
    * count-only view per distinct column grouped by (groupBy, c) —
    * wholly inside the join-view machinery, so it inherits joinType,
    * key normalization, and the crash protocol unchanged. */
  private def auxJoin(j: JoinViewDef, c: String): JoinViewDef =
    j.copy(view = IncrementalView.valsView(j.view, c),
      vdef = IncrementalView.auxDef(j.vdef, c))

  /** The right side with its non-key aliases applied and its key
    * columns renamed to the left names — the normalization every join
    * in this object goes through. */
  private def normRight(j: JoinViewDef, df: DataFrame): DataFrame = {
    val aliased = j.rightRename.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    j.rightKeys.zip(j.leftKeys).foldLeft(aliased) { case (d, (r, l)) =>
      if (r == l) d else d.withColumnRenamed(r, l)
    }
  }

  /** Non-key column collision check (the contract's disjointness
    * clause), run whenever both schemas are readable so a collision
    * is a JoinViewDef-naming error at initialize/refresh entry, not
    * an ambiguous-column analysis failure mid-refresh. */
  private def validateDisjoint(store: ParquetTableStore,
      j: JoinViewDef): Unit =
    for (l <- store.read(j.left); r <- store.read(j.right)) {
      val normed = normRight(j, r).columns
      val dup = normed.groupBy(identity).collect {
        case (c, hits) if hits.length > 1 => c
      }
      require(dup.isEmpty,
        s"JoinViewDef('${j.view}'): key rename collides with an " +
          s"existing '${j.right}' column: ${dup.toSeq.sorted.mkString(", ")}" +
          " — alias it aside via rightRename")
      val rightNonKey = normed.toSet -- j.leftKeys
      val clash = l.columns.toSet.intersect(rightNonKey)
      require(clash.isEmpty,
        s"JoinViewDef('${j.view}'): non-key columns must be disjoint " +
          s"across '${j.left}' and '${j.right}' — colliding: " +
          clash.toSeq.sorted.mkString(", ") +
          " (rename in the source, or join on them)")
      if (j.outer) {
        // a group column takes NULL on the null-extended rows of the
        // OTHER side, and the store's PK merge (like every CDC upsert)
        // is null-unsafe — so group keys must be provably non-null:
        // a JOIN KEY (outer USING joins coalesce it from whichever
        // side exists), a column of a side that is never null-extended
        // away, or a column whose nulls the view's own `where`
        // excludes (the distinct cascade's aux views carry exactly
        // that guard). The guard check is syntactic — the honest
        // bound without an analyzer pass.
        val leftNonKey = l.columns.toSet -- j.leftKeys
        val guarded = j.vdef.where.getOrElse("")
        def whereGuarded(c: String): Boolean =
          guarded.contains(s"`$c` IS NOT NULL") ||
            guarded.contains(s"$c IS NOT NULL")
        val bad = j.vdef.groupBy.filterNot { c =>
          j.leftKeys.contains(c) || whereGuarded(c) ||
            (leftNonKey.contains(c) && !j.neRight) ||
            (rightNonKey.contains(c) && !j.neLeft)
        }
        require(bad.isEmpty,
          s"JoinViewDef('${j.view}'): ${j.joinType} group keys must be " +
            "non-null in the joined shape — join keys, columns of a " +
            "never-null-extended side, or where-guarded " +
            s"`col IS NOT NULL`; nullable: ${bad.mkString(", ")}")
      }
    }

  /** Markers recording each side's NORMALIZED schema (DDL) the last
    * time it was observable — the type source for null extension when
    * that side's current manifest is empty (an all-rows-deleted base
    * commits a version with no buckets and hence no schema). */
  private[cdc] val RightSchemaMarker = "_RIGHT_SCHEMA"
  private[cdc] val LeftSchemaMarker = "_LEFT_SCHEMA"

  private def recordSideSchemas(store: ParquetTableStore,
      j: JoinViewDef): Unit = {
    if (j.neLeft) // unmatched LEFT rows need the RIGHT columns' types
      store.read(j.right).filter(_.columns.nonEmpty).foreach { r =>
        store.writeMarker(j.view, RightSchemaMarker,
          normRight(j, r).schema.toDDL)
      }
    if (j.neRight) // unmatched RIGHT rows need the LEFT columns' types
      store.read(j.left).filter(_.columns.nonEmpty).foreach { l =>
        store.writeMarker(j.view, LeftSchemaMarker, l.schema.toDDL)
      }
  }

  /** One side's NON-KEY fields of the joined shape, for typing the
    * OTHER side's null extensions: from the pinned snapshot when it
    * has a schema, else from the sidecar. None = that shape has never
    * been observed (the view stays empty until it is — documented
    * contract). */
  private def sideFields(store: ParquetTableStore, j: JoinViewDef,
      table: String, at: String, marker: String,
      normalize: DataFrame => DataFrame)
      : Option[Seq[org.apache.spark.sql.types.StructField]] = {
    val snap =
      if (at.isEmpty) store.spark.emptyDataFrame
      else store.readVersion(table, at)
    val fields =
      if (snap.columns.nonEmpty) Some(normalize(snap).schema.fields.toSeq)
      else store.readMarker(j.view, marker).map(ddl =>
        org.apache.spark.sql.types.StructType.fromDDL(ddl).fields.toSeq)
    fields.map(_.filterNot(f => j.leftKeys.contains(f.name)))
  }

  private def rightFields(store: ParquetTableStore, j: JoinViewDef,
      atRight: String): Option[Seq[org.apache.spark.sql.types.StructField]] =
    sideFields(store, j, j.right, atRight, RightSchemaMarker, normRight(j, _))

  private def leftFields(store: ParquetTableStore, j: JoinViewDef,
      atLeft: String): Option[Seq[org.apache.spark.sql.types.StructField]] =
    sideFields(store, j, j.left, atLeft, LeftSchemaMarker, identity)

  /** The joined snapshot at a pinned version pair — the initializer's
    * input and the drained-buffer rebuild base. Empty (schema-less)
    * when either side has no committed version. A LEFT-OUTER view
    * whose right side is a committed-but-EMPTY manifest null-extends
    * every left row through the schema sidecar; without a sidecar
    * (the right shape never existed) it stays empty — null extension
    * has nothing to type the right columns with. */
  private def snapshotJoin(store: ParquetTableStore, j: JoinViewDef,
      atLeft: String, atRight: String): DataFrame = {
    if (atLeft.isEmpty || atRight.isEmpty) return store.spark.emptyDataFrame
    val l = store.readVersion(j.left, atLeft)
    val r = store.readVersion(j.right, atRight)
    if (l.columns.nonEmpty && r.columns.nonEmpty)
      l.join(normRight(j, r), j.leftKeys, j.joinType)
    else if (l.columns.nonEmpty && j.neLeft)
      // right is committed-but-empty: every left row null-extends
      rightFields(store, j, atRight) match {
        case Some(fs) => nullExtendFields(l, fs)
        case None => store.spark.emptyDataFrame
      }
    else if (r.columns.nonEmpty && j.neRight)
      // left is committed-but-empty: every right row null-extends
      leftFields(store, j, atLeft) match {
        case Some(fs) => nullExtendFields(normRight(j, r), fs)
        case None => store.spark.emptyDataFrame
      }
    else store.spark.emptyDataFrame
  }

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
    val snap = prunedSnap(store, feed, otherTable, otherPks, otherAt,
      leftKeys, otherKeys).getOrElse(return None)
    Some(normalizeSnap(snap).join(broadcast(feed), leftKeys))
  }

  /** The other side's snapshot restricted (when its PKs ARE the join
    * keys — a bucket point lookup) or not (a scan; the caller
    * broadcasts the feed) to the feed's key set. */
  private def prunedSnap(store: ParquetTableStore, feed: DataFrame,
      otherTable: String, otherPks: Seq[String], otherAt: String,
      leftKeys: Seq[String], otherKeys: Seq[String]): Option[DataFrame] =
    if (otherKeys == otherPks)
      store.readKeysPrunedAt(otherTable, otherAt, otherPks,
        feed.select(leftKeys.map(col): _*).distinct()
          .toDF(otherKeys: _*)).map(_._1)
    // None for a schema-less (all-rows-deleted) manifest — callers
    // treat None as "that snapshot holds no rows"
    else Some(store.readVersion(otherTable, otherAt))
      .filter(_.columns.nonEmpty)

  /** Null-extend a left-shaped frame to the joined shape: every
    * right-side non-key column appears as a TYPED null (fields from
    * [[rightFields]]), so the leg unions cleanly with the inner legs
    * and downstream casts see the real type, never NullType. */
  private def nullExtendFields(leftShaped: DataFrame,
      fields: Seq[org.apache.spark.sql.types.StructField]): DataFrame =
    fields.foldLeft(leftShaped) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }

  /** Columns the maintenance machinery needs from the joined shape —
    * the prune that keeps the union legs narrow. A `where` predicate
    * may reference columns OUTSIDE the aggregate set: its references
    * are RESOLVED by parsing the predicate text (single-part
    * attribute names against the joined shape), so a filtered view's
    * legs stay pruned to groupBy ∪ aggregates ∪ predicate columns.
    * Only a predicate whose references cannot be statically named
    * (multi-part qualifiers, `*`, unparseable text) falls back to
    * the full joined shape — correctness over the narrow union. */
  private[cdc] def feedColumns(spark: SparkSession,
      vdef: ViewDef): Option[Seq[String]] = {
    val aggCols = (vdef.groupBy ++ vdef.sums ++ vdef.vars ++
      vdef.mins ++ vdef.maxs).distinct
    val whereCols: Option[Seq[String]] = vdef.where match {
      case None => Some(Nil)
      case Some(w) =>
        try {
          val e = spark.sessionState.sqlParser.parseExpression(w)
          val stars = e.collect { case s: UnresolvedStar => s }
          val attrs = e.collect { case a: UnresolvedAttribute => a }
          if (stars.nonEmpty || attrs.exists(_.nameParts.size != 1)) None
          else Some(attrs.map(_.nameParts.head))
        } catch { case scala.util.control.NonFatal(_) => None }
    }
    whereCols.map(ws => (aggCols ++ ws).distinct :+ "_change_type")
  }

  /** One-shot (re)computation from pinned snapshots — initializer,
    * vacuum-recovery rebuild, and the spec's equality anchor. Returns
    * the reflected version pair. Also (re)initializes the distinct
    * cascade's legs. */
  def initialize(store: ParquetTableStore, j: JoinViewDef): (String, String) = {
    validateDisjoint(store, j)
    recordSideSchemas(store, j)
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
      initializeDistincts(store, j)
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
    initializeDistincts(store, j)
    (atL, atR)
  }

  /** Seed the COUNT(DISTINCT) cascade: one occurrence JOIN view per
    * column (same bases, same crash protocol), one single-table count
    * view over each occurrence view's own recorded change feed. */
  private def initializeDistincts(store: ParquetTableStore,
      j: JoinViewDef): Unit =
    j.vdef.distincts.foreach { c =>
      initialize(store, auxJoin(j, c))
      IncrementalView.initialize(store, IncrementalView.valsView(j.view, c),
        IncrementalView.ndView(j.view, c), IncrementalView.ndDef(j.vdef))
    }

  /** Advance the view to BOTH bases' current versions from wherever
    * the `_REFLECTS` pair says it stands — initializing on first call,
    * rebuilding when either reflected version has been vacuumed away,
    * recovering an interrupted refresh through the intent marker
    * (same disambiguation as the single-table protocol: if the view's
    * version moved past the intent's `viewBefore`, the merge
    * committed and the marker fast-forwards). The distinct cascade
    * then advances leg by leg, each exactly-once under its own
    * protocol. */
  def refreshToCurrent(store: ParquetTableStore, j: JoinViewDef): Unit = {
    validateDisjoint(store, j)
    // keep the null-extension type sidecars current while the shapes
    // are observable (they must survive a base table emptying)
    recordSideSchemas(store, j)
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
          // an outer view advancing with a side still ABSENT has no
          // feed algebra (no right schema to null-extend with) — the
          // initializer owns that state
          if (gone(j.left, fromL, toL) || gone(j.right, fromR, toR) ||
              (j.outer && (toL.isEmpty || toR.isEmpty)) ||
              // marker present but the view never materialized a
              // version: it was initialized over an empty/schema-less
              // pair — the feed algebra has no view to merge into
              store.version(j.view).isEmpty)
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
    j.vdef.distincts.foreach { c =>
      refreshToCurrent(store, auxJoin(j, c))
      IncrementalView.refreshToCurrent(store,
        IncrementalView.valsView(j.view, c), j.vdef.groupBy :+ c,
        IncrementalView.ndView(j.view, c), IncrementalView.ndDef(j.vdef))
    }
  }

  /** Advance the view from version pair (fromL, fromR) to (toL, toR)
    * reading ONLY the two change feeds and the pinned snapshots the
    * algebra needs. Returns touched view groups. */
  def refresh(store: ParquetTableStore, j: JoinViewDef,
      fromL: String, toL: String, fromR: String, toR: String): Long = {
    val cols = feedColumns(store.spark, j.vdef)
    // the feeds are cached: each feeds both the key-prune collect and
    // its leg's join (and the merge's two passes over the delta);
    // released after the merge action completes
    val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      /** A delta's unmatched-key rows null-extended with the OTHER
        * side's fields — the NE(Δside, other@to) leg, side-generic. */
      def neLeg(feed: DataFrame, otherTable: String, otherPks: Seq[String],
          otherKeys: Seq[String], otherAt: String,
          normOther: DataFrame => DataFrame,
          fields: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
        val unmatched = prunedSnap(store, feed, otherTable,
          otherPks, otherAt, j.leftKeys, otherKeys) match {
          case Some(snap) if snap.columns.nonEmpty =>
            feed.join(normOther(snap)
              .select(j.leftKeys.map(col): _*).distinct(),
              j.leftKeys, "left_anti")
          // the other side holds no rows at all: every Δ row is unmatched
          case _ => feed
        }
        nullExtendFields(unmatched, fields)
      }
      // leg 1: ΔL ⋈ R@toR — plus NE(ΔL, R@toR) when unmatched LEFT
      // rows survive, and the LEFT-count transition (null-extended
      // R@fromR rows emitted/retracted as ΔL drives a key's left
      // count through zero) when unmatched RIGHT rows survive
      val (legL, legNE1, legTransR) =
        if (fromL == toL) (None, None, None)
        else {
          val feedL = store.changesBetween(j.left, j.leftPks, fromL, toL).cache()
          cached += feedL
          val inner = leg(store, feedL, j.right, j.rightPks, toR,
            j.leftKeys, j.rightKeys, normRight(j, _))
          val ne =
            if (!j.neLeft || toR.isEmpty) None
            else rightFields(store, j, toR).map(fs =>
              neLeg(feedL, j.right, j.rightPks, j.rightKeys, toR,
                normRight(j, _), fs))
          val transR =
            if (!j.neRight || fromR.isEmpty || toL.isEmpty) None
            else leftFields(store, j, toL).flatMap(fs =>
              transitionLeg(store, j, feedL,
                j.left, j.leftPks, j.leftKeys, toL, identity,
                j.right, j.rightPks, j.rightKeys, fromR, normRight(j, _),
                fs))
          (inner, ne, transR)
        }
      // leg 2: L@fromL ⋈ ΔR — plus the RIGHT-count transition when
      // unmatched LEFT rows survive, and NE(ΔR, L@toL) when unmatched
      // RIGHT rows survive
      val (legR, legNE2, legNE2R) =
        if (fromR == toR) (None, None, None)
        else {
          val feedR = normRight(j,
            store.changesBetween(j.right, j.rightPks, fromR, toR)).cache()
          cached += feedR
          val inner = leg(store, feedR, j.left, j.leftPks, fromL,
            j.leftKeys, j.leftKeys, identity)
          val transL =
            if (!j.neLeft || fromL.isEmpty || toR.isEmpty) None
            else rightFields(store, j, toR).flatMap(fs =>
              transitionLeg(store, j, feedR,
                j.right, j.rightPks, j.rightKeys, toR, normRight(j, _),
                j.left, j.leftPks, j.leftKeys, fromL, identity,
                fs))
          val neR =
            if (!j.neRight || toL.isEmpty) None
            else leftFields(store, j, toL).map(fs =>
              neLeg(feedR, j.left, j.leftPks, j.leftKeys, toL,
                identity, fs))
          (inner, transL, neR)
        }
      val legs = (legL.toSeq ++ legR.toSeq ++ legNE1.toSeq ++
        legNE2.toSeq ++ legTransR.toSeq ++ legNE2R.toSeq)
        .map(df => cols.fold(df)(cs => df.select(cs.map(col): _*)))
      if (legs.isEmpty) return 0L
      // without the prune the legs' column ORDERS differ (snapshot
      // side first vs feed side first) — unionByName aligns them
      val feed = legs.reduce(_.unionByName(_))
      IncrementalView.mergeDelta(store, j.view, j.vdef,
        IncrementalView.delta(feed, j.vdef),
        () => snapshotJoin(store, j, toL, toR))
    } finally cached.foreach(_.unpersist())
  }

  /** The match-count TRANSITION leg, side-generic: join keys whose
    * match count on the CHURNED side crossed zero emit/retract the
    * null-extended rows of the SURVIVING side (read at its pinned
    * `from` version). m₁ is counted from the churned side's `to`
    * snapshot restricted to the feed's key set (a point lookup when
    * the join keys are that table's PKs); m₀ = m₁ − ΣΔsigns — never
    * stored, always derivable from the span itself.
    *
    * For a LEFT-outer view: feed = ΔR, counts over R@toR, rows from
    * A@fromL (normRow = identity, fields = right fields). The
    * right-outer mirror swaps every role. */
  private def transitionLeg(store: ParquetTableStore, j: JoinViewDef,
      feed: DataFrame,
      countTable: String, countPks: Seq[String], countKeys: Seq[String],
      countAt: String, normCount: DataFrame => DataFrame,
      rowTable: String, rowPks: Seq[String], rowKeys: Seq[String],
      rowAt: String, normRow: DataFrame => DataFrame,
      fields: Seq[org.apache.spark.sql.types.StructField])
      : Option[DataFrame] = {
    val keys = j.leftKeys
    val sgn = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val dm = feed.groupBy(keys.map(col): _*)
      .agg(sum(sgn).as("_dm"))
    val m1 = prunedSnap(store, feed, countTable, countPks, countAt,
      keys, countKeys) match {
      case Some(snap) if snap.columns.nonEmpty =>
        normCount(snap).groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("_m1"))
      // the churned side holds no rows at `to`: every touched key
      // counts zero matches
      case _ => dm.select(keys.map(col): _*).limit(0)
        .withColumn("_m1", lit(0L))
    }
    val trans = dm.join(m1, keys, "left")
      .withColumn("_m1", coalesce(col("_m1"), lit(0L)))
      .withColumn("_m0", col("_m1") - col("_dm"))
      .filter((col("_m0") > 0) =!= (col("_m1") > 0))
      // matches vanished (m₁=0): the null-extended class is BORN (+);
      // first match appeared: it RETRACTS (−)
      .withColumn("_change_type",
        when(col("_m1") === 0, lit("insert")).otherwise(lit("delete")))
      .select((keys.map(col) :+ col("_change_type")): _*)
    val snapRows =
      if (rowKeys == rowPks)
        store.readKeysPrunedAt(rowTable, rowAt, rowPks,
          trans.select(keys.map(col): _*).distinct()
            .toDF(rowKeys: _*)).map(_._1)
          .getOrElse(return None)
      else store.readVersion(rowTable, rowAt)
    // schema-less surviving side = no rows existed: nothing to extend
    if (snapRows.columns.isEmpty) return None
    Some(nullExtendFields(
      normRow(snapRows).join(broadcast(trans), keys), fields))
  }

  /** The view with derived consumer columns (avg/var/min/max scalars
    * and the cascade's nd_<c> distinct counts) — the single-table
    * read applied to the join view's tables. */
  def read(store: ParquetTableStore, j: JoinViewDef): Option[DataFrame] =
    IncrementalView.read(store, j.view, j.vdef)
}
