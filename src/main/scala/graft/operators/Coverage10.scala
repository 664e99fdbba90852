package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-6 extension wave 2: the remaining TPC-H topologies the corpus
  * can express — Q9, Q11, Q15, Q16, Q17, Q22. With Coverage6/7/8/9
  * this brings the suite to 20 of the 22 classic shapes; Q12 and Q20
  * are the two whose defining columns (l_shipmode / ps_availqty) have
  * no counterpart in the corpus at all.
  *
  * partsupp-derived adaptations (same convention as Q2, Coverage9):
  * the offer relation is the distinct (l_partkey, l_suppkey) pairs of
  * lineitem; ps_supplycost is the per-pair min OFFER PRICE — not the
  * unit price: a division-derived double has a long decimal expansion
  * whose CAST AS DECIMAL(38,10) can land one quantum apart across
  * engines (observed: 28 Q9 rows off by ~1e-10 with min(extprice/qty);
  * min(extprice) keeps every summed term in the price-product class
  * the decimal convention is proven on). "Complaint" suppliers (Q16)
  * are the low-balance ones (s_acctbal < 1000 — non-empty at every
  * verified scale); Q22's "inactive" customers are those with no
  * order since 1999 (the corpus has no customers with zero orders).
  *
  * Floating-point parity notes: l_quantity is integral in this corpus,
  * so Q17's avg is a sum of exactly-representable doubles divided by a
  * count — order-independent, both engines agree exactly. Q22 compares
  * c_acctbal * n > total (all three identically computed) instead of
  * c_acctbal > avg, removing the one division whose rounding could
  * straddle a customer.
  */
object Coverage10 {

  private def oSum(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,10))) AS STRING) AS DOUBLE)"

  /** Q9 over caller-supplied relations. Parametric in the lineitem
    * source so the same plan runs on the flat parquet corpus (QDef
    * below — one compound-key (partkey, suppkey) exchange pair) and on
    * a (l_partkey, l_suppkey)-bucketed layout, where the ps aggregation
    * reuses the scan's bucket partitioning and the fact-fact join
    * co-locates — ZERO compound-key exchanges (BucketedQ9Spec asserts
    * both plans and value-equality). Bucketing the biggest fact on the
    * offer key is the 100 TB answer for every partsupp-shaped join:
    * the layout is written once, every Q2/Q9/Q11/Q16-class query
    * stops paying the widest shuffle in the suite. */
  def q9From(lineitem: org.apache.spark.sql.DataFrame,
             part: org.apache.spark.sql.DataFrame,
             supplier: org.apache.spark.sql.DataFrame,
             orders: org.apache.spark.sql.DataFrame,
             nation: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ps = lineitem
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice")).as("ps_supplycost"))
    lineitem
      .join(broadcast(part.filter(col("p_name").like("%red%"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(supplier), col("s_suppkey") === col("l_suppkey"))
      .join(ps, col("ps_partkey") === col("l_partkey")
        && col("ps_suppkey") === col("l_suppkey"))
      .join(orders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation), col("n_nationkey") === col("s_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))" +
          " * (1 - CAST(l_discount AS DECIMAL(18,2)))" +
          " - CAST(ps_supplycost AS DECIMAL(18,2))" +
          "   * CAST(l_quantity AS DECIMAL(18,0))").as("amount"))
      .groupBy("nation", "o_year")
      .agg(sumExact(col("amount")).as("sum_profit"))
  }

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q9: product-type profit by nation and year -----------------
    // The widest fact-fact shape in the suite: lineitem joins the
    // derived offer relation on the COMPOUND (part, supplier) key —
    // both sides shuffle on the same two columns, one exchange each —
    // while part (name-filtered), supplier, nation broadcast and
    // orders supplies the year.
    //
    // amount is computed in EXACT DECIMAL from the recovered 2dp
    // inputs, not in double: profit differences reach ~1e6 where a
    // dirty double's binary noise (~1e-10) sits ON the DECIMAL(38,10)
    // quantum, and the two engines' double→decimal casts disagreed on
    // 10-28 rows (observed sum drift 1e-8). Casting each 2dp price to
    // DECIMAL(18,2) first makes every product/difference exact — the
    // one identical SQL expression serves both engines.
    QDef("q_tpch_q9",
      s"""WITH ps AS (
         |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         |         min(l_extendedprice) AS ps_supplycost
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT nation, o_year, ${oSum("amount")} AS sum_profit
         |FROM (
         |  SELECT n_name AS nation,
         |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(l_extendedprice AS DECIMAL(18,2))
         |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
         |      - CAST(ps_supplycost AS DECIMAL(18,2))
         |        * CAST(l_quantity AS DECIMAL(18,0)) AS amount
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN nation ON n_nationkey = s_nationkey)
         |GROUP BY nation, o_year
         |""".stripMargin) { (s, dir) =>
      q9From(table(s, dir, "lineitem"), table(s, dir, "part"),
        table(s, dir, "supplier"), table(s, dir, "orders"),
        table(s, dir, "nation"))
    },

    // ---- TPC-H Q11: inventory value concentration -------------------------
    // Per-part share of one nation's total stock value with a HAVING
    // threshold against a scalar total: the total is computed once
    // (broadcast), every group compares against the SAME
    // decimal-exact double, so the cut is deterministic cross-engine.
    QDef("q_tpch_q11",
      s"""WITH ps AS (
         |  SELECT l_partkey AS pk, l_suppkey AS sk,
         |         min(l_extendedprice) AS cost, count(*) AS qty
         |  FROM lineitem GROUP BY 1, 2),
         |v AS (
         |  SELECT pk, cost * qty AS val
         |  FROM ps JOIN supplier ON s_suppkey = sk
         |  JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'),
         |tot AS (SELECT ${oSum("val")} AS t FROM v)
         |SELECT pk AS ps_partkey, ${oSum("val")} AS value
         |FROM v, tot
         |GROUP BY pk, t
         |HAVING ${oSum("val")} > 0.001 * t
         |""".stripMargin) { (s, dir) =>
      val ps = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(min(col("l_extendedprice")).as("cost"),
          count(lit(1)).as("qty"))
      val v = ps
        .join(broadcast(table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation")
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")),
          col("sk") === col("s_suppkey"))
        .select(col("pk"), (col("cost") * col("qty")).as("val"))
      val tot = v.agg(sumExact(col("val")).as("t"))
      v.groupBy("pk").agg(sumExact(col("val")).as("value"))
        .crossJoin(broadcast(tot))
        .filter(col("value") > lit(0.001) * col("t"))
        .select(col("pk").as("ps_partkey"), col("value"))
    },

    // ---- TPC-H Q15: top supplier of a quarter -----------------------------
    // The view + scalar-max shape: quarterly revenue per supplier, keep
    // the max. Revenue doubles come from the decimal-exact convention
    // on BOTH the per-supplier rows and the max, so the equality join
    // cannot miss by an ulp. The revenue aggregate is computed once and
    // reused for the max (no second lineitem scan).
    QDef("q_tpch_q15",
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |         ${oSum("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |""".stripMargin) { (s, dir) =>
      val rev = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      table(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    },

    // ---- TPC-H Q16: supplier diversity per part attribute -----------------
    // COUNT(DISTINCT) over an anti-joined offer relation: the
    // "complaint" suppliers (low balance — s_acctbal < 1000, non-empty
    // at every verified scale) leave via NOT IN (a broadcast anti
    // join), then supplier diversity is counted per (brand, type,
    // size) bucket over the distinct offer pairs.
    QDef("q_tpch_q16",
      """WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
        |            FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT sk) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = pk
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND sk NOT IN (SELECT s_suppkey FROM supplier
        |                 WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_type, p_size
        |""".stripMargin) { (s, dir) =>
      val ps = table(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct()
      val excl = table(s, dir, "supplier")
        .filter(col("s_acctbal") < 1000).select("s_suppkey")
      ps
        .join(broadcast(excl), col("sk") === col("s_suppkey"), "left_anti")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#1"
            && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
          col("p_partkey") === col("pk"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("sk")).as("supplier_cnt"))
    },

    // ---- TPC-H Q17: small-quantity-order revenue --------------------------
    // The correlated-average shape, decorrelated: per-part mean
    // quantity (exact: quantities are integral doubles, so the sum is
    // order-independent), the 0.2× threshold joins back by partkey,
    // qualifying revenue sums decimal-exact and divides by 7.
    QDef("q_tpch_q17",
      s"""SELECT ${oSum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#23'
         |  AND l_quantity < (
         |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
         |    WHERE l2.l_partkey = p_partkey)
         |""".stripMargin) { (s, dir) =>
      val thr = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thr"))
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_brand") === "Brand#23")),
          col("p_partkey") === col("l_partkey"))
        .join(thr, col("t_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((sumExact(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // ---- TPC-H Q22: wealthy inactive customers ----------------------------
    // Scalar-aggregate threshold + NOT EXISTS anti join: customers
    // above the positive-balance average with no order since 1999
    // (the corpus has no zero-order customers). The comparison is
    // c_acctbal * n > total — all three values identically computed on
    // both engines — instead of dividing for the average, so no
    // customer can straddle a rounding boundary.
    QDef("q_tpch_q22",
      s"""WITH stats AS (
         |  SELECT ${oSum("c_acctbal")} AS total, count(*) AS n
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_mktsegment AS seg, count(*) AS numcust,
         |  ${oSum("c_acctbal")} AS totacctbal
         |FROM customer, stats
         |WHERE c_acctbal * n > total
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
         |GROUP BY c_mktsegment
         |""".stripMargin) { (s, dir) =>
      val stats = table(s, dir, "customer")
        .filter(col("c_acctbal") > 0)
        .agg(sumExact(col("c_acctbal")).as("total"),
          count(lit(1)).as("n"))
      table(s, dir, "customer")
        .crossJoin(broadcast(stats))
        .filter(col("c_acctbal") * col("n") > col("total"))
        .join(table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("numcust"),
          sumExact(col("c_acctbal")).as("totacctbal"))
    }
  )
}
