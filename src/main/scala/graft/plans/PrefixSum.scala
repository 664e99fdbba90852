package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key running totals without a key-sized sequential window — the
  * cumulative-sum sibling of [[ShuffleRank]] (rank is the value≡1
  * special case, kept separate because rank can use row_number while
  * a general prefix sum must carry the value).
  *
  * A plain `sum(v) OVER (PARTITION BY key ORDER BY ord)` puts each
  * key's ENTIRE history in one task — with a handful of keys (data
  * sources, tenants) that is a handful of tasks scanning 1/k of the
  * corpus each, the classic window scale-killer. Two phases fix it:
  * rows bucket by the order key's leading byte (256 classes, uniform
  * under a hash key, prefix-respecting because lowercase-hex string
  * order equals byte order), per-(key, bucket) totals reduce to
  * offsets via a window over ≤256 rows PER KEY (bounded-domain, and
  * still partitioned by key so it parallelizes across keys), and the
  * final cumulative value is offset + intra-bucket running sum, where
  * the running-sum window partitions by (key, bucket): no task ever
  * scans more than ~1/256 of one key's rows at any scale.
  * PrefixSumSpec pins brute-force equality and partitioning
  * invariance under adversarial repartitionings.
  */
object PrefixSum {

  /** @param rows   input rows
    * @param key    partition column name (the "per source" axis)
    * @param ordHex a collision-free lowercase-hex ordering key (md5 of
    *               a unique id in the sampling use case)
    * @param tie    unique tiebreak column name (orders rows whose
    *               ordHex collides; with md5-of-unique-id it never
    *               fires but keeps the order total by construction)
    * @param value  numeric column to accumulate
    * @param out    output column: running total of `value` in
    *               (ordHex, tie) order within `key`, INCLUSIVE of the
    *               current row
    */
  def perKey(rows: DataFrame, key: String, ordHex: Column, tie: String,
             value: Column, out: String): DataFrame = {
    val keyed = rows.withColumn("_ps_ord", ordHex)
      .withColumn("_ps_val", value)
      .withColumn("_ps_bucket",
        conv(substring(col("_ps_ord"), 1, 2), 16, 10).cast("int"))
    val sums = keyed.groupBy(col(key), col("_ps_bucket"))
      .agg(sum(col("_ps_val")).as("_ps_bsum"))
    // exclusive prefix offsets over ≤256 bucket totals per key
    val wb = Window.partitionBy(key).orderBy("_ps_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = sums
      .withColumn("_ps_off", sum(col("_ps_bsum")).over(wb) - col("_ps_bsum"))
      .select(col(key), col("_ps_bucket"), col("_ps_off"))
    val wi = Window.partitionBy(key, "_ps_bucket")
      .orderBy(col("_ps_ord"), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offsets), Seq(key, "_ps_bucket"))
      .withColumn(out, col("_ps_off") + sum(col("_ps_val")).over(wi))
      .drop("_ps_ord", "_ps_val", "_ps_bucket", "_ps_off")
  }
}
