package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global rank without a data-sized single-partition
  * window — the "epoch shuffle" primitive of a training-data pipeline:
  * every row gets its position in the total order of a pseudo-random
  * key (md5 of the row id), so each epoch's read order is a
  * reproducible permutation, computed distributed.
  *
  * Two-phase, the DecileBuckets shape: rows bucket by the key's
  * leading byte (256 classes, uniform under a hash key), per-bucket
  * counts reduce to prefix offsets — the only unpartitioned window
  * runs over ≤256 count rows, a bounded-domain reduction — and the
  * rank is offset + intra-bucket row_number, where the row_number
  * window is PARTITIONED by bucket: 256-way parallel, no partition
  * ever sees more than ~1/256 of the corpus. The output is invariant
  * under input partitioning (the key is a total order; buckets are a
  * prefix-respecting split of it), which ShuffleRankSpec pins by
  * re-ranking under adversarial repartitionings.
  */
object ShuffleRank {

  /** @param rows input rows
    * @param key  a (practically) collision-free ordering key column —
    *             md5 hex of a unique id in the shuffle use case; ties,
    *             if any, break arbitrarily but deterministically only
    *             when the caller appends a tiebreak to the key
    * @param out  output rank column name (0-based BIGINT)
    */
  def rank(rows: DataFrame, key: Column, out: String): DataFrame = {
    val keyed = rows.withColumn("_sr_key", key)
      .withColumn("_sr_bucket",
        conv(substring(col("_sr_key"), 1, 2), 16, 10).cast("int"))
    val counts = keyed.groupBy("_sr_bucket").agg(count(lit(1)).as("_sr_cnt"))
    // prefix offsets over ≤256 bucket counts — bounded-domain window
    val wb = Window.orderBy("_sr_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = counts
      .withColumn("_sr_off", sum(col("_sr_cnt")).over(wb) - col("_sr_cnt"))
      .select("_sr_bucket", "_sr_off")
    val wr = Window.partitionBy("_sr_bucket").orderBy("_sr_key")
    keyed.join(broadcast(offsets), "_sr_bucket")
      .withColumn(out,
        (col("_sr_off") + row_number().over(wr) - 1).cast("long"))
      .drop("_sr_key", "_sr_bucket", "_sr_off")
  }
}
