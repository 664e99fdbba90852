package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentiles over a LIVE incremental view — the monitoring read that
  * makes q_grid_percentile (operators/Coverage19.scala) continuous.
  *
  * The trick is that grid-histogram percentiles need no new
  * maintenance machinery at all: the sufficient statistic is the
  * (group, bucket) COUNT histogram, which is exactly a count-only
  * [[IncrementalView.ViewDef]] — insert/update/delete maintenance,
  * exactly-once markers, and the change-feed protocol all come for
  * free. This object only adds the READ EDGE: the ceil-threshold
  * cumulative scan that turns live bucket counts into percentile
  * edges, arithmetic pinned 1:1 to the batch query's oracle (integer
  * ceil `(p·n+99) div 100`, min bucket with cum ≥ threshold).
  *
  * SCALE. The view is O(groups × grid) regardless of how many rows
  * ever flowed through it; each refresh is O(delta + touched groups)
  * (the single-table IVM cost model); the read below is windowed over
  * ≤|grid| rows per group — corpus-size-free end to end. The measure
  * must be bucketed UPSTREAM (the base table carries the bucket
  * column): the view's group keys are base columns, and a fixed-width
  * bucket is one projection in whatever feeds the base — the same
  * grid-shaping stance as IncrementalKsDrift's eviction note.
  */
object GridPercentile {

  /** The maintenance side: a count-only view over (group…, bucket). */
  def viewDef(group: Seq[String], bucket: String,
      where: Option[String] = None): IncrementalView.ViewDef =
    IncrementalView.ViewDef(group :+ bucket, Nil, where = where)

  /** The read edge: per-group percentile bucket edges from a
    * (group…, bucket, n) histogram. `pcts` are integer percents
    * (e.g. 50, 90, 99); `width` scales the reported edge back to the
    * measure's unit (edge = bucket·width, the bucket's lower bound).
    * Every exchange below is bounded by groups×grid×|pcts|. */
  def percentiles(hist: DataFrame, group: Seq[String], bucket: String,
      pcts: Seq[Long], width: Long = 1L): DataFrame = {
    // out-of-range percents don't crash this declarative form — they
    // silently DROP the group's row (no cum ever reaches the threshold),
    // which is worse; same boundary contract as the streaming sweep
    require(pcts.forall(p => p >= 1L && p <= 100L),
      s"percentiles must be in [1, 100], got ${pcts.mkString(", ")}")
    val s = hist.sparkSession
    val gcols = group.map(col)
    val ns = hist.groupBy(gcols: _*)
      .agg(sum(col("n")).cast("long").as("ptile_n"))
    val wCum = Window.partitionBy(group.map(col): _*).orderBy(bucket)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(gcols :+ col(bucket) :+
      sum(col("n")).over(wCum).cast("long").as("cum"): _*)
    val ps = s.range(1).select(
      explode(array(pcts.map(p => lit(p).cast("long")): _*)).as("p"))
    val t = ns.crossJoin(broadcast(ps))
      .withColumn("thresh", expr("(p * ptile_n + 99) div 100"))
    t.join(cum, group)
      .filter(col("cum") >= col("thresh"))
      .groupBy(gcols :+ col("p") :+ col("ptile_n").as("n"): _*)
      .agg((min(col(bucket)) * width).cast("long").as("edge"))
      .select(gcols ++ Seq(col("p"), col("edge"), col("n")): _*)
  }

  /** Percentiles off the live view (None until it materializes). */
  def read(store: ParquetTableStore, view: String, group: Seq[String],
      bucket: String, pcts: Seq[Long], width: Long = 1L)
      : Option[DataFrame] =
    IncrementalView.read(store, view, viewDef(group, bucket))
      .map(percentiles(_, group, bucket, pcts, width))

  /** Percentiles off a live JOIN view (round-13 verdict #8): the same
    * count-only histogram, but its (group…, bucket) columns span TWO
    * mirrored tables — e.g. p90 order value per customer segment,
    * where the bucket column rides the orders base (bucketed
    * UPSTREAM, the standing grid-shaping stance) and the segment
    * rides customers. Everything IncrementalJoinView already proves —
    * delta-join maintenance, join-key churn, dangling keys, outer
    * forms, exactly-once markers — applies unchanged, because the
    * histogram is just a count-only join view; this is only the read
    * edge over it. The JoinViewDef's vdef must be count-only with the
    * bucket as the LAST group key (the [[viewDef]] shape).
    * GridPercentileJoinSpec pins 25-round churn recompute-exactness. */
  def readJoin(store: ParquetTableStore, j: IncrementalJoinView.JoinViewDef,
      pcts: Seq[Long], width: Long = 1L): Option[DataFrame] = {
    val gb = j.vdef.groupBy
    require(gb.size >= 2 && j.vdef.sums.isEmpty,
      s"grid-percentile join view must be COUNT-ONLY grouped by " +
        s"(group…, bucket); got groupBy=${gb.mkString(",")} " +
        s"sums=${j.vdef.sums.mkString(",")}")
    IncrementalJoinView.read(store, j)
      .map(percentiles(_, gb.init, gb.last, pcts, width))
  }
}
