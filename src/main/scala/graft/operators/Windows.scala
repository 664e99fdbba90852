package graft.operators

import graft._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, sort/limit/top-k, dedup, and the CDC compaction
  * primitive (last-writer-wins per key — the batch expression of the
  * reference's upsert semantics, see SURVEY.md §2-A M1/C2:
  * /root/reference/consumer/src/main/java/com/example/cdc/DebeziumToPostgresConsumer.java:197-220).
  *
  * Scale notes: every window here partitions by a real key (user_id,
  * custkey, brand) — no global `Window.orderBy` without partitioning,
  * which would funnel 100 TB through one task. Top-k-per-group uses
  * rank-then-filter, which Spark executes with partial top-k pushdown
  * under the window group limit optimization.
  */
object Windows {

  val defs: Seq[QDef] = Seq(

    QDef("q_win_rownum",
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
        |FROM events
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          row_number().over(w).cast("long").as("rn"))
    },

    QDef("q_win_rank",
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST(RANK() OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
    },

    QDef("q_win_lag_lead",
      """SELECT event_id, user_id, value,
        |  value - LAG(value, 1, 0.0) OVER w AS delta,
        |  LEAD(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          (col("value") - lag(col("value"), 1, 0.0).over(w)).as("delta"),
          lead(col("event_type"), 1).over(w).as("next_type"))
    },

    QDef("q_win_running",
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running_spend
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
    },

    QDef("q_win_movavg",
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,10))) OVER w AS STRING) AS DOUBLE)
        |    / COUNT(value) OVER w AS mov_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          (sum(dec(col("value"))).over(w).cast("double") / count(col("value")).over(w)).as("mov_avg"))
    },

    QDef("q_win_range",
      """SELECT p_brand, p_partkey, p_size,
        |  COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
        |                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS near_cnt
        |FROM part
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_size"))
        .rangeBetween(-2, Window.currentRow)
      table(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          count(lit(1)).over(w).as("near_cnt"))
    },

    // ---- sort / limit / top-k ------------------------------------------
    QDef("q_sort_limit",
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    QDef("q_sort_nulls",
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC NULLS LAST, c_custkey ASC, o_orderkey ASC NULLS FIRST
        |LIMIT 150
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc_nulls_last, col("c_custkey").asc,
          col("o_orderkey").asc_nulls_first)
        .limit(150)
    },

    QDef("q_topk_pergroup",
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      table(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
    },

    // ---- dedup / CDC compaction ----------------------------------------
    QDef("q_dedup_exact",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, dir) =>
      table(s, dir, "events").select("user_id", "event_type").distinct()
    },

    QDef("q_dedup_lastperkey",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      table(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    },

    // Batch expression of the CDC materialization: last writer wins per
    // key, then 'error' (standing in for op='d') drops the key — the same
    // dedup-then-apply shape foreachBatch uses before the JDBC merge.
    QDef("q_cdc_compact",
      """SELECT user_id, event_type AS last_op, value AS last_value FROM (
        |  SELECT user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 AND event_type <> 'error'
        |""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      table(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_op"), col("value").as("last_value"))
    },
  )
}
