package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe 2-D skyline (Pareto frontier): a point survives when no
  * other point is ≥ in both dimensions with one strict.
  *
  * The strictly-higher-price running max(date) is a TWO-PHASE segmented
  * prefix max, because the price dimension can be near-continuous
  * (distinct ≈ rows): an unpartitioned Window would funnel the whole
  * distinct-price reduction into one task. Phase 1 range-buckets the
  * distinct prices (value buckets from a broadcast min/max — no
  * sampling pass) and runs the strict prefix max WITHIN each bucket in
  * parallel; phase 2 prefix-maxes the ≤nB per-bucket summaries
  * (bounded by config, not data) and broadcasts them back. Bucketing by
  * VALUE keeps the invariant that a higher bucket holds strictly
  * higher prices, so best_higher = greatest(in-bucket prefix,
  * higher-bucket summary) is exact — including at bucket boundaries
  * and under arbitrary price ties (equal prices share a bucket and a
  * reduction row). Used by q_skyline (operators.Coverage6) and
  * measured against the single-window formulation in
  * tools.SkylineStress (2.24× at 5M rows, structurally unbounded).
  */
object SegmentedSkyline {

  /** @param o    rows with columns (o_orderkey, o_orderdate, o_totalprice)
    * @param nB   bucket count (defaults to shuffle parallelism upstream)
    * @return the skyline rows, same three columns
    */
  def skyline(o: DataFrame, nB: Int): DataFrame = {
    val byPrice = o.groupBy("o_totalprice")
      .agg(max(col("o_orderdate")).as("mx_date"))
    val stats = byPrice.groupBy()
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val bucketed = byPrice.crossJoin(broadcast(stats))
      .withColumn("bkt",
        when(col("hi") <= col("lo"), lit(0)).otherwise(
          least(lit(nB - 1),
            floor((col("o_totalprice") - col("lo")) /
              ((col("hi") - col("lo")) / nB)).cast("int"))))
      .drop("lo", "hi")
    // phase 1: strict prefix max over price-desc order, per bucket
    val wIn = Window.partitionBy("bkt").orderBy(col("o_totalprice").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = bucketed
      .withColumn("best_in_bucket", max(col("mx_date")).over(wIn))
    // phase 2: per-bucket maxima; the strictly-higher-bucket prefix max
    // runs over ≤ nB rows (bounded by config, not by data)
    val wUp = Window.orderBy(col("bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = bucketed.groupBy("bkt")
      .agg(max(col("mx_date")).as("bkt_max"))
      .withColumn("best_above", max(col("bkt_max")).over(wUp))
      .select("bkt", "best_above")
    // greatest() skips nulls: null only when no strictly-higher price exists
    val run = inBucket.join(broadcast(summaries), "bkt")
      .withColumn("best_higher",
        greatest(col("best_in_bucket"), col("best_above")))
    val dominated =
      coalesce(col("best_higher") >= col("o_orderdate"), lit(false)) ||
        (col("mx_date") > col("o_orderdate"))
    o.join(run, "o_totalprice").filter(!dominated)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
  }
}
