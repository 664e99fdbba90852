package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact quantile bucketing over a BOUNDED-domain integer column with
  * no global sort: the corpus reduces to a per-value count table, the
  * cumulative runs over that reduction only (|domain| values, not
  * |corpus| rows), cutoff k = min value whose cumulative count reaches
  * k/nBuckets of the corpus — all-integer arithmetic (cum·nBuckets ≥
  * k·n), so engines agree exactly — and rows bucket against the
  * broadcast (nBuckets−1)-element cutoff array.
  *
  * Duplicate-heavy domains collapse buckets naturally: if one value
  * holds 40% of the corpus it absorbs several cutoffs and the output
  * has fewer than nBuckets classes — the correct behavior for exact
  * (non-interpolated) quantiles. Used by q_len_buckets
  * (operators.Coverage9); property-tested on degenerate corpora in
  * DecileBucketsSpec.
  */
object DecileBuckets {

  /** @param rows     input rows
    * @param valueCol a non-null integral column to bucket on
    * @param nBuckets number of quantile classes (e.g. 10 for deciles)
    * @return (bucket BIGINT, n_docs, mn_len, mx_len) — one row per
    *         non-empty bucket; buckets are 1-based
    */
  def histogram(rows: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    val counts = rows.groupBy(col(valueCol).as("len"))
      .agg(count(lit(1)).as("cnt"))
    // window over DISTINCT VALUES only — bounded domain, the corpus never sorts
    val wl = Window.orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("cum", sum(col("cnt")).over(wl))
    val tot = rows.groupBy().agg(count(lit(1)).as("n"))
    val ks = rows.sparkSession.range(1, nBuckets).select(col("id").as("k"))
    val cut = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
      .filter(col("cum") * nBuckets >= col("k") * col("n"))
      .groupBy("k").agg(min(col("len")).as("cutoff"))
    val cutArr = cut.groupBy()
      .agg(sort_array(collect_list(col("cutoff"))).as("cuts"))
    rows.crossJoin(broadcast(cutArr))
      .select((lit(1) + size(expr(s"filter(cuts, c -> c < $valueCol)")))
        .cast("long").as("bucket"), col(valueCol).as("len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).as("mn_len"), max(col("len")).as("mx_len"))
  }
}
