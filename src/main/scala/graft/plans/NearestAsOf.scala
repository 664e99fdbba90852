package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed merge_asof(direction='nearest'): for every LEFT-kind
  * row, the RIGHT-kind row of the same key closest in time, looking
  * both ways. One merged stream per key, two frame-bounded window
  * passes — the running last right-timestamp behind, the running first
  * ahead — so |left|+|right| rows cross ONE key exchange and no
  * time-band join ever forms. Ties (equidistant behind/ahead) resolve
  * toward the EARLIER right row; a right row at the exact left
  * timestamp yields gap 0 from either side. All arithmetic is integer
  * timestamps, so engines agree exactly. Used by q_asof_nearest
  * (operators.Coverage9); tie semantics are property-tested on
  * adversarial synthetic streams in NearestAsOfSpec.
  */
object NearestAsOf {

  /** @param events columns (event_id, user_id, event_type, us BIGINT)
    * @param leftType  the kind being matched (e.g. "purchase")
    * @param rightType the kind supplying timestamps (e.g. "click")
    * @return (event_id, user_id, purchase_us, nearest_click_us, gap_us)
    */
  def nearest(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val wNext = ord.rowsBetween(1, Window.unboundedFollowing)
    val rightUs = when(col("event_type") === rightType, col("us"))
    val nearestCol =
      when(col("next_us").isNull ||
        (col("prev_us").isNotNull &&
          col("us") - col("prev_us") <= col("next_us") - col("us")),
        col("prev_us")).otherwise(col("next_us"))
    events
      .filter(col("event_type").isin(leftType, rightType))
      .withColumn("prev_us", last(rightUs, ignoreNulls = true).over(wPrev))
      .withColumn("next_us", first(rightUs, ignoreNulls = true).over(wNext))
      .filter(col("event_type") === leftType)
      .withColumn("nearest_click_us", nearestCol)
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("nearest_click_us"),
        abs(col("purchase_us") - col("nearest_click_us")).as("gap_us"))
  }
}
