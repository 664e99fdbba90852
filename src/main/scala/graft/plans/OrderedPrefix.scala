package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-bucketed two-phase prefix aggregation over an ARBITRARY numeric
  * total order — the generalization of [[ShuffleRank]] (md5-hex order) and
  * [[PrefixSum]] (per-key md5-hex order) to orders given by a data column
  * (a timestamp, a revenue figure): running max, rank, and running sum in
  * (ord, tie) order, computed without ever sorting more than ~1/254 of
  * the input (or of one key's input) in a single task.
  *
  * Hex-prefix bucketing doesn't apply to a value order, so rows bucket by
  * `width_bucket` over the [min, max] range of the order key (broadcast
  * 1-row bounds; per-key bounds when `keys` is non-empty). width_bucket
  * is monotone, so buckets are contiguous slices of the order; per-bucket
  * summaries reduce to prefix offsets via a window over ≤254 summary rows
  * per key (bounded-domain — and still partitioned by `keys`, parallel
  * across keys), and every per-row window partitions by (keys, bucket).
  *
  * Unlike the hash orders, a VALUE order can be arbitrarily skewed (all
  * rows equal → one bucket, and the intra-bucket window degenerates to a
  * key-sized sort) — callers order by value-like columns (event times,
  * prices) where range spread is the norm; OrderedPrefixSpec pins the
  * degenerate case for correctness, not speed.
  *
  * `ord` is cast to DOUBLE for bucketing and intra-bucket ordering: the
  * cast must be order-faithful (monotone always holds; collisions are
  * fine — `tie` breaks them — but the caller's oracle must order by the
  * same double). `ord` must be NON-NULL: a null order key has no
  * position in the total order, and rows carrying one are DROPPED (the
  * null bucket matches no offset row — the contract OrderedPrefixSpec
  * pins). Callers with nullable order columns filter or coalesce
  * first, exactly as they would have to define ORDER BY semantics for
  * the null.
  */
object OrderedPrefix {
  private val NB = 254

  /** Attach `_op_ord` (double order key) and `_op_bucket` ∈ [1, NB]. */
  private def bucketed(rows: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val keyed = rows.withColumn("_op_ord", ord.cast("double"))
    val bounds =
      if (keys.isEmpty)
        keyed.agg(min(col("_op_ord")).as("_op_lo"), max(col("_op_ord")).as("_op_hi"))
      else
        keyed.groupBy(keys.map(col): _*)
          .agg(min(col("_op_ord")).as("_op_lo"), max(col("_op_ord")).as("_op_hi"))
    val joined =
      if (keys.isEmpty) keyed.crossJoin(broadcast(bounds))
      else keyed.join(broadcast(bounds), keys)
    joined
      // null ord explicitly maps to a null bucket and is dropped — the
      // documented contract. Without the isNull arm, least() would SKIP
      // the null width_bucket and silently file null-ord rows into the
      // last bucket, mis-ranking them instead of excluding them (the
      // bug OrderedPrefixSpec's null test exists to keep dead).
      .withColumn("_op_bucket",
        when(col("_op_ord").isNull, lit(null))
          .when(col("_op_hi") <= col("_op_lo"), lit(1L))
          .otherwise(least(
            width_bucket(col("_op_ord"), col("_op_lo"), col("_op_hi"), lit(NB)),
            lit(NB.toLong)))
          .cast("int"))
      .filter(col("_op_bucket").isNotNull)
      .drop("_op_lo", "_op_hi")
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
    val b = bucketed(rows.withColumn("_op_val", value), keys, ord)
    val kcols = keys.map(col)
    val summaries = b.groupBy(kcols :+ col("_op_bucket"): _*)
      .agg(max(col("_op_val")).as("_op_bmax"))
    val offsets = summaries
      .withColumn("_op_prev", max(col("_op_bmax")).over(bucketWindow(keys)))
      .select(kcols :+ col("_op_bucket") :+ col("_op_prev"): _*)
    val wi = Window.partitionBy(kcols :+ col("_op_bucket"): _*)
      .orderBy(col("_op_ord"), tie)
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0L else -1L)
    // greatest() skips nulls: first bucket has no _op_prev, first row of a
    // bucket has no exclusive intra max — null only when both are absent.
    b.join(broadcast(offsets), keys :+ "_op_bucket")
      .withColumn(out, greatest(col("_op_prev"), max(col("_op_val")).over(wi)))
      .drop("_op_ord", "_op_val", "_op_bucket", "_op_prev")
  }

  /** 1-based rank and inclusive running sum of `value` in (ord, tie)
    * order within each `keys` group (global when empty). The sum keeps
    * `value`'s type — pass an exact DECIMAL for cross-engine bit parity
    * (decimal addition is order-independent, so the two-phase total
    * equals the sequential window's).
    */
  def rankSum(rows: DataFrame, keys: Seq[String], ord: Column, tie: Column,
              value: Column, rankOut: String, sumOut: String): DataFrame = {
    val b = bucketed(rows.withColumn("_op_val", value), keys, ord)
    val kcols = keys.map(col)
    val summaries = b.groupBy(kcols :+ col("_op_bucket"): _*)
      .agg(count(lit(1)).as("_op_bcnt"), sum(col("_op_val")).as("_op_bsum"))
    val wb = bucketWindow(keys)
    val offsets = summaries
      .withColumn("_op_coff", coalesce(sum(col("_op_bcnt")).over(wb), lit(0L)))
      .withColumn("_op_soff", sum(col("_op_bsum")).over(wb))
      .select(kcols :+ col("_op_bucket") :+ col("_op_coff") :+ col("_op_soff"): _*)
    val wi = Window.partitionBy(kcols :+ col("_op_bucket"): _*)
      .orderBy(col("_op_ord"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intraSum = sum(col("_op_val")).over(wi)
    b.join(broadcast(offsets), keys :+ "_op_bucket")
      .withColumn(rankOut, (col("_op_coff") + row_number().over(wi)).cast("long"))
      .withColumn(sumOut, coalesce(col("_op_soff") + intraSum, intraSum))
      .drop("_op_ord", "_op_val", "_op_bucket", "_op_coff", "_op_soff")
  }

  /** Rank only (1-based position in (ord, tie) order within `keys`). */
  def rank(rows: DataFrame, keys: Seq[String], ord: Column, tie: Column,
           out: String): DataFrame =
    rankSum(rows, keys, ord, tie, lit(0L), out, "_op_ranksum").drop("_op_ranksum")
}
