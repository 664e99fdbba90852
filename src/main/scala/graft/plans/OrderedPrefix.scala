package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BucketSearch

/** Range-bucketed two-phase prefix aggregation over an ARBITRARY numeric
  * total order — the generalization of [[ShuffleRank]] (md5-hex order) and
  * [[PrefixSum]] (per-key md5-hex order) to orders given by a data column
  * (a timestamp, a revenue figure): running max, rank, and running sum in
  * (ord, tie) order, computed without ever sorting more than ~1/254 of
  * the input (or of one key's input) in a single task.
  *
  * Buckets are EQUI-DEPTH, not equal-width: boundaries are sampled
  * quantile cutoffs of the COMPOSITE (ord, tie) order (the same statistic
  * Spark's own RangePartitioner draws for a global sort), so a heavily
  * skewed value order — 90% identical timestamps, zipfian revenue —
  * still splits into ~NB even slices, where the previous
  * `width_bucket([min, max])` bounds collapsed most rows into one bucket
  * and the intra-bucket window degenerated toward a single data-sized
  * sort. Bucketing by the composite matters: cutoffs over `ord` alone
  * cannot separate rows with EQUAL ord values, which is exactly what a
  * skewed order is made of; including the tie (always part of the
  * window's ORDER BY) keeps the assignment monotone in the total order
  * while splitting the heavy value by tie range.
  *
  * Cutoff selection is fully distributed and bounded: a ~1/NB Bernoulli
  * sample is hashed into NB cells, each cell sorts its slice and picks
  * ≤ NB-1 equally-spaced local candidates (per-task buffer ≈ N/NB² rows),
  * and the ≤ NB² candidates merge into the final ≤ NB-1 cutoffs —
  * broadcast like the old bounds row. Per-row assignment is
  * [[graft.functions.CompositeLowerBound]], an O(log NB) binary search
  * inside whole-stage codegen. Sampling noise moves bucket BOUNDARIES
  * only: any monotone assignment yields identical ranks/sums/maxes, so
  * results never depend on the sample (OrderedPrefixSpec pins output
  * invariance under adversarial repartitionings).
  *
  * `ord` is cast to DOUBLE for bucketing and intra-bucket ordering: the
  * cast must be order-faithful (monotone always holds; collisions are
  * fine — `tie` breaks them — but the caller's oracle must order by the
  * same double). `ord` must be NON-NULL: a null order key has no
  * position in the total order, and rows carrying one are DROPPED (the
  * contract OrderedPrefixSpec pins). Callers with nullable order
  * columns filter or coalesce first, exactly as they would have to
  * define ORDER BY semantics for the null. A null `tie` sorts FIRST
  * (Spark's asc default), consistently in sampling and search.
  */
object OrderedPrefix {
  private val NB = 254
  private val SEED = 0xC0FFEE

  /** ≤ NB-1 equally-spaced 1-based picks from a sorted array column.
    * `sorted` MUST be a bound column reference, not a computed
    * expression: it is referenced from inside the `transform` lambda,
    * and Spark does not common-subexpression-eliminate across lambda
    * boundaries — a nested `sort_array(...)` here re-sorts the array
    * once per generated index (253× per row; measured 10× the entire
    * bucketing cost before the callers materialized the sort into its
    * own projection). */
  private def pickEvery(sorted: Column): Column = {
    val picks = transform(sequence(lit(1), lit(NB - 1)),
      i => try_element_at(sorted,
        (floor(i.cast("double") * size(sorted) / NB) + 1).cast("int")))
    array_distinct(filter(picks, x => x.isNotNull))
  }

  /** Attach `_op_ord` (double order key), `_op_tie`, and `_op_bucket`
    * (equi-depth composite bucket, contiguous in (ord, tie) order).
    * Exposed to the spec so bucket balance under skew is assertable.
    */
  private[plans] def bucketed(rows: DataFrame, keys: Seq[String], ord: Column,
      tie: Column): DataFrame = {
    val keyed = rows
      .withColumn("_op_ord", ord.cast("double"))
      .withColumn("_op_tie", tie)
      .filter(col("_op_ord").isNotNull)
    val kcols = keys.map(col)
    val cand = struct(col("_op_ord").as("o"), col("_op_tie").as("t"))
    val sampled = keyed
      .sample(withReplacement = false, 1.0 / NB, SEED)
      .select(kcols :+ cand.as("_op_c")
        :+ pmod(xxhash64(col("_op_ord"), col("_op_tie")), lit(NB)).as("_op_cell"): _*)
    // level 1: per (key, cell) sorted slice → local equally-spaced
    // picks. The sort lands in its OWN projection so pickEvery reads a
    // bound reference (see pickEvery's lambda-CSE note).
    val level1 = sampled
      .groupBy(kcols :+ col("_op_cell"): _*)
      .agg(sort_array(collect_list(col("_op_c"))).as("_op_sorted"))
      .select(kcols :+ pickEvery(col("_op_sorted")).as("_op_picks"): _*)
    // level 2: merge ≤ NB×(NB-1) candidates → final cutoffs, split into
    // parallel (ord, tie) arrays for the binary-search expression
    val merged = sort_array(flatten(collect_list(col("_op_picks"))))
    val cuts0 =
      (if (keys.isEmpty) level1.agg(merged.as("_op_all"))
       else level1.groupBy(kcols: _*).agg(merged.as("_op_all")))
        .select(kcols :+ pickEvery(col("_op_all")).as("_op_cuts"): _*)
    val cuts = cuts0.select(kcols
      :+ transform(col("_op_cuts"), c => c.getField("o")).as("_op_co")
      :+ transform(col("_op_cuts"), c => c.getField("t")).as("_op_ct"): _*)
    val joined =
      if (keys.isEmpty) keyed.crossJoin(broadcast(cuts))
      else keyed.join(broadcast(cuts), keys, "left") // absent key → bucket 1
    BucketSearch.register(rows.sparkSession)
    joined
      .withColumn("_op_bucket",
        expr("composite_lower_bound(_op_co, _op_ct, _op_ord, _op_tie)"))
      .drop("_op_co", "_op_ct")
  }

  private def bucketWindow(keys: Seq[String]) =
    (if (keys.isEmpty) Window.orderBy("_op_bucket")
     else Window.partitionBy(keys.map(col): _*).orderBy("_op_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)

  /** Running max of `value` in (ord, tie) order within each `keys` group
    * (global when empty). `inclusive = false` gives the strictly-before
    * prefix max — null on each group's first row — which is what a
    * "new record?" test needs.
    */
  def runningMax(rows: DataFrame, keys: Seq[String], ord: Column, tie: Column,
                 value: Column, out: String, inclusive: Boolean = true): DataFrame = {
    val b = bucketed(rows.withColumn("_op_val", value), keys, ord, tie)
    val kcols = keys.map(col)
    val summaries = b.groupBy(kcols :+ col("_op_bucket"): _*)
      .agg(max(col("_op_val")).as("_op_bmax"))
    val offsets = summaries
      .withColumn("_op_prev", max(col("_op_bmax")).over(bucketWindow(keys)))
      .select(kcols :+ col("_op_bucket") :+ col("_op_prev"): _*)
    val wi = Window.partitionBy(kcols :+ col("_op_bucket"): _*)
      .orderBy(col("_op_ord"), col("_op_tie"))
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0L else -1L)
    // greatest() skips nulls: first bucket has no _op_prev, first row of a
    // bucket has no exclusive intra max — null only when both are absent.
    b.join(broadcast(offsets), keys :+ "_op_bucket")
      .withColumn(out, greatest(col("_op_prev"), max(col("_op_val")).over(wi)))
      .drop("_op_ord", "_op_tie", "_op_val", "_op_bucket", "_op_prev")
  }

  /** 1-based rank and inclusive running sum of `value` in (ord, tie)
    * order within each `keys` group (global when empty). The sum keeps
    * `value`'s type — pass an exact DECIMAL for cross-engine bit parity
    * (decimal addition is order-independent, so the two-phase total
    * equals the sequential window's).
    */
  def rankSum(rows: DataFrame, keys: Seq[String], ord: Column, tie: Column,
              value: Column, rankOut: String, sumOut: String): DataFrame = {
    val b = bucketed(rows.withColumn("_op_val", value), keys, ord, tie)
    val kcols = keys.map(col)
    val summaries = b.groupBy(kcols :+ col("_op_bucket"): _*)
      .agg(count(lit(1)).as("_op_bcnt"), sum(col("_op_val")).as("_op_bsum"))
    val wb = bucketWindow(keys)
    val offsets = summaries
      .withColumn("_op_coff", coalesce(sum(col("_op_bcnt")).over(wb), lit(0L)))
      .withColumn("_op_soff", sum(col("_op_bsum")).over(wb))
      .select(kcols :+ col("_op_bucket") :+ col("_op_coff") :+ col("_op_soff"): _*)
    val wi = Window.partitionBy(kcols :+ col("_op_bucket"): _*)
      .orderBy(col("_op_ord"), col("_op_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intraSum = sum(col("_op_val")).over(wi)
    b.join(broadcast(offsets), keys :+ "_op_bucket")
      .withColumn(rankOut, (col("_op_coff") + row_number().over(wi)).cast("long"))
      .withColumn(sumOut, coalesce(col("_op_soff") + intraSum, intraSum))
      .drop("_op_ord", "_op_tie", "_op_val", "_op_bucket", "_op_coff", "_op_soff")
  }

  /** Rank only (1-based position in (ord, tie) order within `keys`). */
  def rank(rows: DataFrame, keys: Seq[String], ord: Column, tie: Column,
           out: String): DataFrame =
    rankSum(rows, keys, ord, tie, lit(0L), out, "_op_ranksum").drop("_op_ranksum")

  /** SEVERAL global ranks over the same rows — (ord_i, tie) order each —
    * from ONE shared sampling pass. Three separate [[rank]] calls draw
    * three Bernoulli samples, run three two-level cutoff aggregations,
    * and three bucket-count passes; here the sample is drawn once, the
    * orderings ride a tag column through a single grouped aggregation
    * (the per-ord composite differs, so rows explode by ordering INSIDE
    * the sampled ~1/NB slice — tiny), and ALL orderings' bucket counts
    * come from one exploded count pass. The two bounded intermediates —
    * the 1-row tag-keyed cutoff map and the ≤ n·NB offset rows — are
    * localCheckpoint'd (the IvfIndex probe-table / DedupOps fixpoint
    * pattern): they are ≤ n·(NB−1) structs BY CONSTRUCTION, each
    * consumer reads the materialized copy, and the cutoff subtree is
    * never replicated per consumer (measured: replication put 12
    * sampling exchanges into one plan before this). Per-ordering window
    * shuffles remain — n genuinely different orders are n shuffles.
    * Same null-ord contract as [[rank]], applied across ALL orderings
    * (a row null in any ord has no position in that total order and is
    * dropped).
    */
  def rankMulti(rows: DataFrame, orders: Seq[(Column, String)],
      tie: Column): DataFrame = {
    require(orders.nonEmpty)
    val n = orders.size
    def ordCol(i: Int) = col(s"_op_ord$i")
    val keyed0 = orders.zipWithIndex.foldLeft(rows) { case (df, ((o, _), i)) =>
      df.withColumn(s"_op_ord$i", o.cast("double"))
    }.withColumn("_op_tie", tie)
    val keyed = keyed0.filter(
      (0 until n).map(ordCol(_).isNotNull).reduce(_ && _))

    // one sample; per sampled row, one (tag, composite, cell) per ordering
    val tagged = keyed
      .sample(withReplacement = false, 1.0 / NB, SEED)
      .select(explode(array((0 until n).map { i =>
        struct(lit(i).as("i"),
          struct(ordCol(i).as("o"), col("_op_tie").as("t")).as("c"))
      }: _*)).as("_op_x"))
      .select(col("_op_x.i").as("_op_i"), col("_op_x.c").as("_op_c"),
        pmod(xxhash64(col("_op_x.c.o"), col("_op_x.c.t")), lit(NB))
          .as("_op_cell"))
    val level1 = tagged
      .groupBy(col("_op_i"), col("_op_cell"))
      .agg(sort_array(collect_list(col("_op_c"))).as("_op_sorted"))
      .select(col("_op_i"), pickEvery(col("_op_sorted")).as("_op_picks"))
    val perTag = level1.groupBy(col("_op_i"))
      .agg(sort_array(flatten(collect_list(col("_op_picks")))).as("_op_all"))
      .select(col("_op_i"), pickEvery(col("_op_all")).as("_op_cuts"))
      .select(col("_op_i"), struct(
        transform(col("_op_cuts"), c => c.getField("o")).as("co"),
        transform(col("_op_cuts"), c => c.getField("t")).as("ct")).as("_op_e"))
    // ≤ n rows → ONE row carrying every ordering's cutoffs, pinned so
    // no consumer re-runs the sampling subtree. Pinning goes through
    // loopInput (not a bare localCheckpoint): Dataset.unpersist cannot
    // free a localCheckpoint's RDD, so an unregistered pin would
    // strand block-manager entries per execution — loopInput's
    // registry releases them in the clearMemos sweep.
    val cutsRow = graft.operators.DedupOps.loopInput(perTag.agg(
      map_from_arrays(collect_list(col("_op_i")), collect_list(col("_op_e")))
        .as("_op_m")))

    BucketSearch.register(rows.sparkSession)
    // all bucket ids in one projection; coalesce covers the empty-input
    // edge (zero sampled rows → empty map → null lookup → bucket 1)
    val assigned = (0 until n).foldLeft(keyed.crossJoin(broadcast(cutsRow))) {
      case (df, i) => df.withColumn(s"_op_b$i", coalesce(expr(
        s"composite_lower_bound(_op_m[$i].co, _op_m[$i].ct, _op_ord$i, _op_tie)"),
        lit(1)))
    }.drop("_op_m")

    // every ordering's bucket counts in ONE pass (explode before the
    // partial count — collapses to ≤ n·NB rows pre-shuffle), then the
    // prefix offsets; ≤ n·NB rows, pinned for the n broadcast joins
    val offsets = assigned
      .select(explode(array((0 until n).map(i =>
        struct(lit(i).as("i"), col(s"_op_b$i").as("b"))): _*)).as("_op_y"))
      .groupBy(col("_op_y.i").as("_op_i"), col("_op_y.b").as("_op_b"))
      .agg(count(lit(1)).as("_op_bcnt"))
      .withColumn("_op_coff", coalesce(sum(col("_op_bcnt")).over(
        Window.partitionBy("_op_i").orderBy("_op_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_op_i"), col("_op_b"), col("_op_coff"))
    val offsetsPinned = graft.operators.DedupOps.loopInput(offsets)

    // chained per-ordering rank: each stage is one broadcast join
    // (≤ NB pinned offset rows) plus one window shuffle on its bucket id
    val ranked = orders.zipWithIndex.foldLeft(assigned) {
      case (df, ((_, out), i)) =>
        val wi = Window.partitionBy(s"_op_b$i")
          .orderBy(ordCol(i), col("_op_tie"))
        df.join(broadcast(offsetsPinned.filter(col("_op_i") === i)
            .select(col("_op_b").as(s"_op_b$i"), col("_op_coff"))),
          Seq(s"_op_b$i"))
          .withColumn(out, (col("_op_coff") + row_number().over(wi)).cast("long"))
          .drop("_op_coff")
    }
    ranked.drop((0 until n).flatMap(i =>
      Seq(s"_op_ord$i", s"_op_b$i")) :+ "_op_tie": _*)
  }
}
