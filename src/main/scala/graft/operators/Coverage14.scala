package graft.operators

import graft._
import graft.plans.OrderedPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 extension wave 4: pipeline-operations monitoring — the
  * queries an engineer runs against the SAME corpus to decide how to
  * run everything else (is today's volume anomalous? which join keys
  * need salting?).
  *
  * Reference scope: the reference's operational surface is "watch the
  * consumer log and SELECT count(*) from the mirror"
  * (/root/reference/README.md:85-134); these are the Spark-first
  * monitoring duals over the mirror tables.
  */
object Coverage14 {

  val defs: Seq[QDef] = Seq(

    // ---- daily volume anomaly (7-day trailing z-score) -------------------
    // Event-count trend monitoring: flag days whose volume deviates
    // ≥1.5σ from the trailing 7-day window (prior days only — today
    // can't explain itself). The window runs over the per-day aggregate
    // — a bounded-domain table (days, not events), so the unpartitioned
    // ORDER BY day frame is ≤366 rows/year at any corpus size; the
    // data-sized work is one hash aggregation. All-integer counts make
    // trailing mean/std exact cross-engine (identical double exprs).
    QDef("q_daily_anomaly",
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, n,
        |    CAST(count(*) OVER pw AS BIGINT) AS wn,
        |    CAST(sum(n) OVER pw AS BIGINT) AS ws,
        |    CAST(sum(n * n) OVER pw AS BIGINT) AS wss
        |  FROM d
        |  WINDOW pw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT day, n, wn,
        |    CAST(ws AS DOUBLE) / wn AS m,
        |    sqrt((CAST(wss AS DOUBLE) - wn * (CAST(ws AS DOUBLE) / wn)
        |          * (CAST(ws AS DOUBLE) / wn)) / CAST(wn - 1 AS DOUBLE)) AS sd
        |  FROM w WHERE wn >= 3)
        |SELECT day, n, round(m, 6) AS trailing_mean,
        |  round((CAST(n AS DOUBLE) - m) / sd, 4) AS z
        |FROM z
        |WHERE sd > 0 AND abs((CAST(n AS DOUBLE) - m) / sd) >= 1.5
        |""".stripMargin) { (s, dir) =>
      val d = table(s, dir, "events")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val pw = Window.orderBy("day").rowsBetween(-7, -1)
      val w = d.select(col("day"), col("n"),
        count(lit(1)).over(pw).as("wn"),
        sum(col("n")).over(pw).as("ws"),
        sum(col("n") * col("n")).over(pw).as("wss"))
        .filter(col("wn") >= 3)
      val m = col("ws").cast("double") / col("wn")
      val sd = sqrt((col("wss").cast("double") - col("wn") * m * m)
        / (col("wn") - 1).cast("double"))
      w.select(col("day"), col("n"), m.as("m"), sd.as("sd"))
        .withColumn("z_raw", (col("n").cast("double") - col("m")) / col("sd"))
        .filter(col("sd") > 0 && abs(col("z_raw")) >= 1.5)
        .select(col("day"), col("n"), round(col("m"), 6).as("trailing_mean"),
          round(col("z_raw"), 4).as("z"))
    },

    // ---- join-key skew diagnostics (the "should I salt?" report) ---------
    // For each candidate join key, the numbers that decide the physical
    // strategy at 100 TB: row count, distinct keys, and the share of
    // rows owned by the hottest key (one straggler task's worth under a
    // plain hash join). Each leg is two bounded aggregations
    // (key → count, then a 1-row max/sum); legs union. Pure integer
    // ratios — exact cross-engine.
    QDef("q_skew_report",
      """WITH ks AS (
        |  SELECT 'lineitem.l_partkey' AS key_col, l_partkey AS k
        |  FROM lineitem
        |  UNION ALL SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
        |  UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders
        |  UNION ALL SELECT 'events.user_id', user_id FROM events),
        |pk AS (SELECT key_col, k, count(*) AS c FROM ks GROUP BY 1, 2),
        |agg AS (
        |  SELECT key_col, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys, max(c) AS max_c
        |  FROM pk GROUP BY 1)
        |SELECT key_col, n_rows, n_keys,
        |  round(CAST(n_rows AS DOUBLE) / n_keys, 6) AS avg_rows_per_key,
        |  round(CAST(max_c AS DOUBLE) / n_rows, 6) AS max_key_share
        |FROM agg
        |""".stripMargin) { (s, dir) =>
      val ks = Seq(
        ("lineitem.l_partkey", table(s, dir, "lineitem")
          .select(col("l_partkey").as("k"))),
        ("lineitem.l_suppkey", table(s, dir, "lineitem")
          .select(col("l_suppkey").as("k"))),
        ("orders.o_custkey", table(s, dir, "orders")
          .select(col("o_custkey").as("k"))),
        ("events.user_id", table(s, dir, "events")
          .select(col("user_id").as("k"))))
        .map { case (n, df) => df.withColumn("key_col", lit(n)) }
        .reduceLeft(_ unionByName _)
      ks.groupBy("key_col", "k").agg(count(lit(1)).as("c"))
        .groupBy("key_col")
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_c"))
        .select(col("key_col"), col("n_rows"), col("n_keys"),
          round(col("n_rows").cast("double") / col("n_keys"), 6)
            .as("avg_rows_per_key"),
          round(col("max_c").cast("double") / col("n_rows"), 6)
            .as("max_key_share"))
    },

    // ---- RFM customer segmentation ---------------------------------------
    // The classic mirror-side marketing rollup: per customer, recency
    // (days since last order, vs the corpus max date), frequency
    // (order count), monetary (exact decimal spend), each scored into
    // quintiles — three NTILE(5)s, all three run as the range-bucketed
    // two-phase rank (plans.OrderedPrefix) instead of one-task global
    // windows, with SQL NTILE's remainder rule reproduced
    // arithmetically (the q_ccnet_buckets construction). Output is the
    // segment-level rollup, so the row count is ≤125 at any scale.
    // Recency ranks ascending by days (recent = best = tile 1),
    // frequency/monetary descending by value (biggest = tile 1).
    QDef("q_rfm_segments",
      """WITH o AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT)
        |      AS rec_days,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS mon
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT o_custkey, rec_days, freq, mon,
        |    ntile(5) OVER (ORDER BY rec_days, o_custkey) AS r_score,
        |    ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
        |    ntile(5) OVER (ORDER BY CAST(CAST(mon AS STRING) AS DOUBLE) DESC,
        |                   o_custkey) AS m_score
        |  FROM o)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(SUM(mon) AS STRING) AS DOUBLE) AS segment_spend
        |FROM t GROUP BY 1, 2, 3
        |""".stripMargin) { (s, dir) =>
      val orders = table(s, dir, "orders")
      val maxDate = orders.agg(max(col("o_orderdate").cast("date")).as("mx"))
      val o = DedupOps.loopInput(orders
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate").cast("date")).as("last_d"),
          count(lit(1)).as("freq"),
          sum(dec(col("o_totalprice"))).as("mon"))
        .crossJoin(broadcast(maxDate))
        .select(col("o_custkey"),
          datediff(col("mx"), col("last_d")).cast("long").as("rec_days"),
          col("freq"), col("mon")))
      // NTILE(5) remainder rule from the two-phase rank + group count
      // (the customer count is invariant across the three scorings —
      // computed once from the checkpointed aggregate)
      val cnt = o.agg(count(lit(1)).as("_cnt"))
      // the three rankings range over the SAME per-customer aggregate,
      // so their cutoff sets come from ONE shared sampling pass
      // (OrderedPrefix.rankMulti): one sample scan and one tagged
      // two-level aggregation replace three of each, and the ranks
      // chain on one pipeline instead of assembling through three
      // customer-keyed joins. The per-rank bucket windows stay separate
      // (three genuinely different orders = three shuffles — inherent).
      val ranked = OrderedPrefix.rankMulti(o, Seq(
        (col("rec_days").cast("double"), "_rk_r"),
        (-col("freq").cast("double"), "_rk_f"),
        (-col("mon").cast("double"), "_rk_m")), col("o_custkey"))
      def score5(df: org.apache.spark.sql.DataFrame, rk: String,
          out: String): org.apache.spark.sql.DataFrame =
        df.withColumn(out,
          when(col(rk) <= col("_r") * (col("_q") + 1),
            expr(s"($rk - 1) div (_q + 1)") + 1)
            .otherwise(col("_r") + 1 +
              expr(s"($rk - _r * (_q + 1) - 1) div greatest(_q, 1)")))
          .drop(rk)
      val withN = ranked.crossJoin(broadcast(cnt))
        .withColumn("_q", expr("_cnt div 5")).withColumn("_r", col("_cnt") % 5)
      val scored = score5(score5(score5(withN,
        "_rk_r", "r_score"), "_rk_f", "f_score"), "_rk_m", "m_score")
      scored.groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("mon")).cast("double").as("segment_spend"))
    },

    // ---- day-of-week seasonality profile ---------------------------------
    // The order-volume seasonality staple: ISO weekday (1 = Monday),
    // order count, exact decimal revenue, and each weekday's share of
    // total revenue — one hash aggregation over orders plus a broadcast
    // 1-row total; the share divides two identical exact-decimal-cast
    // doubles, so it can't drift cross-engine. Output ≤ 7 rows at any
    // scale.
    QDef("q_dow_seasonality",
      """WITH d AS (
        |  SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS revd
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
        |        AS STRING) AS DOUBLE) AS tot FROM orders)
        |SELECT CAST(dow AS BIGINT) AS dow, n_orders,
        |  CAST(CAST(revd AS STRING) AS DOUBLE) AS revenue,
        |  round(CAST(CAST(revd AS STRING) AS DOUBLE) / tot, 6) AS rev_share
        |FROM d, t
        |""".stripMargin) { (s, dir) =>
      val orders = table(s, dir, "orders")
      val d = orders
        .groupBy((weekday(col("o_orderdate").cast("date")) + 1).cast("long")
          .as("dow"))
        .agg(count(lit(1)).as("n_orders"), sum(dec(col("o_totalprice")))
          .as("revd"))
      val t = orders.agg(sum(dec(col("o_totalprice"))).cast("double").as("tot"))
      d.crossJoin(broadcast(t))
        .select(col("dow"), col("n_orders"),
          col("revd").cast("double").as("revenue"),
          round(col("revd").cast("double") / col("tot"), 6).as("rev_share"))
    },
  )
}
