package graft.plans

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for every left row (key, t) attach the latest right row
  * with the same key and time ≤ t. The canonical point-in-time lookup
  * for CDC/event data (e.g. "state of the account when the order was
  * placed"); Spark has no built-in operator for it.
  *
  * Two implementations, identical results:
  *
  *  - `viaWindow`: compose built-ins — equi-join on key with a range
  *    predicate, then keep the max-time right row per left row. Simple,
  *    but materializes every (left × earlier-right) pair per key before
  *    the window prunes — O(L·R/key) intermediate, which explodes on
  *    hot keys at scale.
  *
  *  - `merged`: the scale path. Tag both sides, union, ONE shuffle by
  *    key, sort within partitions by (key, time, tag), then a linear
  *    sweep carries the latest right payload per key and emits joined
  *    rows at left rows. Intermediate size is |L|+|R| regardless of key
  *    skew; this is the same shape a custom SortMergeAsOfJoinExec would
  *    produce, expressed with repartition+sortWithinPartitions+
  *    mapPartitions so Catalyst still plans the shuffle/sort.
  */
object AsOfJoin {

  /** Built-ins composition (oracle anchor). Ties on right time are
    * broken by the highest `tieBreak` column value. */
  def viaWindow(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime))
    val w = Window.partitionBy(left.columns.toIndexedSeq.map(left(_)): _*)
      .orderBy(right(rightTime).desc, right(tieBreak).desc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Single-shuffle merge-sweep (inner as-of semantics: left rows with
    * no earlier right row are dropped, like SQL ASOF JOIN). */
  def merged(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      tieBreak: String): DataFrame = {
    val leftCols = left.schema.fields
    val rightCols = right.schema.fields
    val outSchema = StructType(leftCols ++ rightCols.map(_.copy(nullable = true)))

    // The join key keeps its native type through the shuffle/sort/sweep.
    // A silent cast (e.g. to LONG) would turn a string key into NULL for
    // every row and collapse all keys into one sweep group — fail fast
    // on mismatched key types instead.
    val lkt = left.schema(leftKey).dataType
    val rkt = right.schema(rightKey).dataType
    require(lkt == rkt,
      s"as-of join key types differ: $leftKey is $lkt, $rightKey is $rkt")

    // Tagged union: key, time, tag (right=0 sorts before left=1 at equal
    // time → "time ≤ t" is inclusive), tie, then both payloads.
    val l = left.select(
      col(leftKey).as("_k"), col(leftTime).as("_t"),
      lit(1).as("_tag"), lit(0L).as("_tie"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("_lp"),
      lit(null).cast(StructType(rightCols)).as("_rp"))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), col(tieBreak).cast("long").as("_tie"),
      lit(null).cast(StructType(leftCols)).as("_lp"),
      struct(right.columns.toIndexedSeq.map(col): _*).as("_rp"))

    val swept = l.unionByName(r)
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_t"), col("_tag"), col("_tie"))
      .mapPartitions { it =>
        var curKey: Any = null
        var lastRight: Row = null
        it.flatMap { row =>
          val k = row.get(0)
          if (k != curKey) { curKey = k; lastRight = null }
          if (row.getInt(2) == 0) { // right side: remember latest payload
            lastRight = row.getStruct(5)
            Iterator.empty
          } else if (lastRight != null) { // left side with a match
            val lp = row.getStruct(4)
            Iterator(Row.fromSeq(lp.toSeq ++ lastRight.toSeq))
          } else Iterator.empty
        }
      }(Encoders.row(outSchema))
    swept
  }
}
