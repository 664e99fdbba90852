package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Advanced relational surface (SURVEY.md §2-B joins/aggregations rows;
  * the reference's own read path is plain SQL over its mirror,
  * /root/reference/README.md:131-134): subqueries (scalar, IN, correlated
  * EXISTS — Catalyst rewrites them into joins), percentiles, ordered
  * string/list aggregation, pivot, NULL-handling functions, and two
  * classic TPC-H-shaped multi-join aggregations.
  *
  * Subquery entries run through spark.sql on registered views so the
  * SQL frontend + analyzer rewrite path is exercised, not just the
  * DataFrame DSL. Where Spark SQL and DuckDB accept identical text, the
  * oracle IS the engine query string.
  */
object Advanced {

  /** SQL that runs verbatim on both engines. */
  private def both(name: String, tables: Seq[String], sql: String): QDef =
    QDef(name, sql) { (s, dir) => views(s, dir, tables: _*); s.sql(sql) }

  val defs: Seq[QDef] = Seq(

    both("q_subq_scalar", Seq("customer"),
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS STRING) AS DOUBLE) / COUNT(c_acctbal)
        |  FROM customer)
        |""".stripMargin),

    both("q_subq_in", Seq("orders", "customer"),
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |""".stripMargin),

    // TPC-H Q4 shape: correlated EXISTS against the fact table.
    both("q_subq_exists_corr", Seq("orders", "lineitem"),
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |""".stripMargin),

    // Correlated scalar subquery in the projection.
    both("q_subq_scalar_select", Seq("nation", "supplier"),
      """SELECT n_nationkey, n_name,
        |  (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers
        |FROM nation
        |""".stripMargin),

    // Null-aware anti join (NOT IN rewrites differently from NOT EXISTS
    // when the subquery can yield NULLs — exercised here on the
    // rewrite path Catalyst uses for NOT IN).
    both("q_subq_not_in", Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |""".stripMargin),

    // TPC-H Q2 shape: correlated aggregate equality.
    both("q_subq_corr_max", Seq("customer"),
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer c
        |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |""".stripMargin),

    // Multiset set operations (bag semantics).
    QDef("q_except_all",
      """SELECT l_suppkey AS k FROM lineitem
        |EXCEPT ALL
        |SELECT s_suppkey FROM supplier
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").select(col("l_suppkey").as("k"))
        .exceptAll(table(s, dir, "supplier").select(col("s_suppkey").as("k")))
    },

    QDef("q_intersect_all",
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT ALL
        |SELECT n_nationkey FROM nation
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersectAll(table(s, dir, "nation").select(col("n_nationkey").as("k")))
    },

    // TPC-H Q5 shape: six-table join, dims broadcastable.
    QDef("q_tpch_q5",
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))) AS STRING) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |""".stripMargin) { (s, dir) =>
      val region = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = table(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      val supplier = table(s, dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // Exact interpolated percentiles (percentile_cont semantics on both).
    QDef("q_agg_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS price_p25
        |FROM lineitem GROUP BY l_returnflag
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_extendedprice, 0.25)"), 6).as("price_p25"))
    },

    // Ordered string aggregation + sorted collected lists. The key list
    // is numerically sorted, then joined to a string — the driver's
    // pandas canonicalizer can't hash raw array cells (round-1 err).
    QDef("q_agg_listagg",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  array_to_string(list_sort(list(n_nationkey)), ',') AS keys
        |FROM nation GROUP BY n_regionkey
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "nation").groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          expr("array_join(transform(array_sort(collect_list(n_nationkey)), x -> CAST(x AS STRING)), ',')")
            .as("keys"))
    },

    // Pivot: one column per order status (oracle = FILTER aggregation,
    // which is exactly what Spark's pivot lowers to).
    QDef("q_pivot_status",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
    },

    // NULL-handling functions over outer-join output.
    QDef("q_null_handling",
      """SELECT c_custkey,
        |  coalesce(o_totalprice, 0.0) AS price_or_zero,
        |  o_orderkey IS NULL AS no_order,
        |  nullif(c_mktsegment, 'MACHINERY') AS seg_or_null,
        |  ifnull(CAST(o_orderkey AS BIGINT), -1) AS key_or_neg
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |""".stripMargin) { (s, dir) =>
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("o_totalprice"), lit(0.0)).as("price_or_zero"),
          col("o_orderkey").isNull.as("no_order"),
          nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg_or_null"),
          ifnull(col("o_orderkey"), lit(-1L)).as("key_or_neg"))
    },
  )
}
