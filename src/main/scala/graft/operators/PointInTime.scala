package graft.operators

import graft._
import graft.plans.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time lookups (as-of join) and dataset profiling.
  *
  * The attribution query — each purchase matched to the same user's
  * latest prior view/click — runs through both as-of implementations
  * (built-ins window composition and the single-shuffle merge-sweep,
  * see graft.plans.AsOfJoin); both must hash-match DuckDB's native
  * ASOF JOIN.
  */
object PointInTime {

  /** Point-in-time state reconstruction: each key's last-written row as
    * of time `t` — the CDC time-travel primitive behind q_state_at.
    * One T-filter + last-writer-wins per key (row_number over
    * (ts, tie) DESC, the same order the CDC compactor uses).
    *
    * `day` names a date partition column of a time-partitioned history
    * table; when set, the REDUNDANT day-level predicate
    * `day <= date(t)` is added alongside the row-level ts filter.
    * Redundant for correctness, load-bearing at scale: the day
    * predicate references only the partition column, so it prunes
    * whole partitions at planning time — on a 100 TB history table the
    * scan reads only days ≤ T instead of every file
    * (StateAtPruningSpec asserts selectedPartitions shrinks to
    * exactly the ≤T days). The corpus's flat events table can't show
    * this (ts is rebuilt from parquet nanos, so only IsNotNull
    * pushes — q_state_at scaladoc); the partitioned layout is how the
    * operator is deployed.
    */
  def stateAt(hist: DataFrame, key: String, ts: String, tie: String,
              t: org.apache.spark.sql.Column,
              day: Option[String] = None): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(ts).desc, col(tie).desc)
    val pruned = day.fold(hist)(d => hist.filter(col(d) <= to_date(t)))
    pruned.filter(col(ts) <= t)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  private def purchases(df: DataFrame) =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))

  private def views(df: DataFrame) =
    df.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))

  private val asofOracle =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  v.event_id AS view_id, CAST(v.ts AS TIMESTAMP) AS view_ts,
      |  v.value AS view_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type IN ('view', 'click')) v
      |  ON v.user_id = p.user_id AND v.ts <= p.ts
      |""".stripMargin

  private val outCols = Seq("purchase_id", "user_id", "purchase_ts",
    "view_id", "view_ts", "view_value")

  val defs: Seq[QDef] = Seq(

    QDef("q_asof_window", asofOracle) { (s, dir) =>
      val ev = table(s, dir, "events")
      AsOfJoin.viaWindow(purchases(ev), "user_id", "purchase_ts",
        views(ev), "v_user_id", "view_ts", tieBreak = "view_id")
        .select(outCols.map(col): _*)
    },

    QDef("q_asof_merge", asofOracle) { (s, dir) =>
      val ev = table(s, dir, "events")
      AsOfJoin.merged(purchases(ev), "user_id", "purchase_ts",
        views(ev), "v_user_id", "view_ts", tieBreak = "view_id")
        .select(outCols.map(col): _*)
    },

    // Column profiling: null counts, cardinalities, ranges — the "what
    // is in this dataset" primitive every pipeline run starts with.
    QDef("q_profile",
      """SELECT 'l_quantity' AS col, COUNT(*) AS n, COUNT(l_quantity) AS non_null,
        |  COUNT(DISTINCT l_quantity) AS nd,
        |  min(l_quantity) AS mn, max(l_quantity) AS mx
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', COUNT(*), COUNT(l_discount), COUNT(DISTINCT l_discount),
        |  min(l_discount), max(l_discount) FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', COUNT(*), COUNT(l_extendedprice),
        |  COUNT(DISTINCT l_extendedprice), min(l_extendedprice), max(l_extendedprice)
        |FROM lineitem
        |""".stripMargin) { (s, dir) =>
      val li = table(s, dir, "lineitem")
      def profile(c: String): DataFrame = li.agg(
        count(lit(1)).as("n"), count(col(c)).as("non_null"),
        countDistinct(col(c)).as("nd"),
        min(col(c)).as("mn"), max(col(c)).as("mx"))
        .select(lit(c).as("col"), col("n"), col("non_null"), col("nd"),
          col("mn"), col("mx"))
      profile("l_quantity")
        .unionByName(profile("l_discount"))
        .unionByName(profile("l_extendedprice"))
    },
  )
}
