package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Relational core: projection/filter, all join shapes, aggregation
  * (incl. rollup/cube/grouping sets), having, set ops.
  *
  * Reference scope: the analytics surface over CDC-materialized tables
  * declared in SURVEY.md §2-B (the reference itself reads its sink with
  * plain SQL, e.g. /root/reference/README.md:131-134).
  *
  * Scale notes: every aggregate here is a partial-agg-friendly built-in
  * (map-side combine before the shuffle); double sums go through
  * DECIMAL(38,10) so results are identical regardless of partitioning —
  * a correctness property, but also what makes re-runs at 1000 executors
  * reproducible. Dimension joins (nation/region/supplier/customer at
  * TPC-H shape) are broadcast-hinted: at 100 TB the fact side never
  * shuffles for those joins.
  */
object Relational {

  val defs: Seq[QDef] = Seq(

    // ---- projection + filter -------------------------------------------
    QDef("q_proj_filter",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |       l_extendedprice * (1 - l_discount) AS net
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 5 AND 45
        |  AND l_linestatus = 'F' AND l_shipdate >= TIMESTAMP '1995-01-01'
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(5, 45)
          && col("l_linestatus") === "F"
          && col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    },

    QDef("q_filter_like",
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE (p_type LIKE 'PROMO%' OR p_name LIKE '%widget%')
        |  AND p_brand IS NOT NULL AND p_size BETWEEN 5 AND 40
        |  AND NOT (p_brand = 'Brand#13' AND p_type = 'ECONOMY')
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "part")
        .filter((col("p_type").like("PROMO%") || col("p_name").like("%widget%"))
          && col("p_brand").isNotNull && col("p_size").between(5, 40)
          && !(col("p_brand") === "Brand#13" && col("p_type") === "ECONOMY"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    },

    // ---- joins ----------------------------------------------------------
    QDef("q_join_inner",
      """SELECT o_orderkey, o_orderdate, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .join(broadcast(table(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_totalprice", "c_name", "c_mktsegment")
    },

    QDef("q_join_left",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    },

    QDef("q_join_right",
      """SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
        |FROM lineitem RIGHT JOIN orders ON l_orderkey = o_orderkey
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"), "right")
        .select("o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity")
    },

    QDef("q_join_full",
      """SELECT n_nationkey, n_name, s_suppkey, s_name
        |FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "nation")
        .join(table(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"), "full")
        .select("n_nationkey", "n_name", "s_suppkey", "s_name")
    },

    QDef("q_join_semi",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // threshold chosen so the anti side is non-empty at every scale
    // factor (a trivially-empty result would make the oracle check
    // vacuous)
    QDef("q_join_anti",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    },

    QDef("q_join_cross",
      "SELECT r_name, n_name FROM region CROSS JOIN nation") { (s, dir) =>
      table(s, dir, "region").crossJoin(table(s, dir, "nation"))
        .select("r_name", "n_name")
    },

    QDef("q_join_theta",
      """SELECT s_suppkey, s_name, c_custkey, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "supplier")
        .join(table(s, dir, "customer"),
          col("s_nationkey") === col("c_nationkey") && col("c_acctbal") > col("s_acctbal"))
        .select("s_suppkey", "s_name", "c_custkey", "c_acctbal")
    },

    // TPC-H Q3 shape: fact-fact join + broadcast dim, group, exact revenue.
    QDef("q_join_multi",
      """SELECT l_orderkey,
        |       CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS revenue,
        |       o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'MACHINERY' AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |""".stripMargin) { (s, dir) =>
      val cust = table(s, dir, "customer").filter(col("c_mktsegment") === "MACHINERY")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      table(s, dir, "lineitem")
        .join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
    },

    // ---- aggregation ----------------------------------------------------
    // TPC-H Q1 shape: the flagship partial-aggregatable scan query.
    QDef("q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1997-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumExact(col("l_quantity")).as("sum_qty"),
          sumExact(col("l_extendedprice")).as("sum_base_price"),
          sumExact(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    QDef("q_agg_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(DISTINCT l_suppkey) AS nd_supps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
    },

    QDef("q_agg_stats",
      """SELECT c_mktsegment,
        |  round(stddev_samp(c_acctbal), 4) AS sd,
        |  round(var_samp(c_acctbal), 2) AS vr,
        |  min(c_acctbal) AS mn, max(c_acctbal) AS mx,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS STRING) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
        |FROM customer GROUP BY c_mktsegment
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").groupBy("c_mktsegment")
        .agg(round(stddev_samp(col("c_acctbal")), 4).as("sd"),
          round(var_samp(col("c_acctbal")), 2).as("vr"),
          min(col("c_acctbal")).as("mn"), max(col("c_acctbal")).as("mx"),
          avgExact(col("c_acctbal")).as("avg_bal"))
    },

    QDef("q_agg_global",
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS total_qty,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sumExact(col("l_quantity")).as("total_qty"),
        min(col("l_shipdate")).as("min_ship"), max(col("l_shipdate")).as("max_ship"))
    },

    QDef("q_agg_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(sumExact(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    },

    QDef("q_agg_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_price, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders").cube("o_orderstatus", "o_orderpriority")
        .agg(sumExact(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
    },

    QDef("q_agg_groupingsets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |""".stripMargin) { (s, dir) =>
      views(s, dir, "orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS sum_price
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |""".stripMargin)
    },

    QDef("q_agg_having",
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS q
        |FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 100
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"), sumExact(col("l_quantity")).as("q"))
        .filter(col("n") > 100)
    },

    // HLL sketch — no exact SQL equivalent; driver does a rows-only check.
    // At 100 TB this replaces COUNT(DISTINCT)'s full shuffle with a
    // fixed-size mergeable sketch per partition.
    QDef.noOracle("q_agg_approx_distinct") { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
          count(lit(1)).as("n"))
    },

    // ---- set operations -------------------------------------------------
    QDef("q_union_all",
      """SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
        |UNION ALL
        |SELECT s_nationkey, s_acctbal FROM supplier
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"))
        .unionAll(table(s, dir, "supplier").select(col("s_nationkey"), col("s_acctbal")))
    },

    QDef("q_union_distinct",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(table(s, dir, "supplier").select(col("s_nationkey")))
        .distinct()
    },

    QDef("q_intersect",
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
    },

    QDef("q_except",
      """SELECT n_nationkey AS k FROM nation
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "nation").select(col("n_nationkey").as("k"))
        .except(table(s, dir, "supplier").select(col("s_nationkey").as("k")))
    },
  )
}
