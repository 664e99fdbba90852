package graft.operators

import graft._
import org.apache.spark.sql.functions._

/** Round-6 extension: the two remaining TPC-H classic shapes.
  *
  * The synthetic corpus has no `partsupp` table and no
  * `l_receiptdate`/`l_commitdate` columns, so both queries keep the
  * CLASSIC JOIN TOPOLOGY exactly (that is what the optimizer audit
  * exercises) with documented column adaptations:
  *   - Q2's partsupp := the distinct (l_partkey, l_suppkey) offers in
  *     lineitem, with ps_supplycost := min offer price — one exact
  *     double picked from the data, so the correlated min-equality is
  *     cross-engine stable (no derived arithmetic).
  *   - Q21's "kept orders waiting" flag := l_returnflag = 'R' — like
  *     receipt>commit it is intra-lineitem-row, which is what makes the
  *     EXISTS/NOT-EXISTS self-joins pure lineitem↔lineitem.
  */
object Coverage9 {

  val defs: Seq[QDef] = Seq(

    // ---- TPC-H Q2: min-cost supplier (correlated scalar subquery) ---------
    // The classic decorrelation benchmark: a 4-way dim join whose filter
    // compares against a correlated per-part MIN over the SAME 4-way
    // join. The engine expresses the decorrelated plan directly — one
    // shared region-filtered offer relation, a per-part min aggregate,
    // and an equality join back — which is the plan Catalyst's
    // RewriteCorrelatedScalarSubquery produces from the SQL form. The
    // region/nation/supplier dims broadcast; the only data-sized
    // exchanges are the offer groupBy and the partkey min-join.
    QDef("q_tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
        |FROM part, ps, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size <= 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |""".stripMargin) { (s, dir) =>
      val ps = table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .agg(min(col("l_extendedprice")).as("ps_supplycost"))
      val natEu = table(s, dir, "nation")
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supEu = table(s, dir, "supplier")
        .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      // every European offer for every part — shared by both the outer
      // query and the correlated min (computed once, not per part)
      val offers = ps.join(broadcast(supEu),
        col("ps_suppkey") === col("s_suppkey"))
      val minCost = offers.groupBy("ps_partkey")
        .agg(min(col("ps_supplycost")).as("min_cost"))
      offers
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")),
          col("p_partkey") === col("ps_partkey"))
        .join(minCost, Seq("ps_partkey"))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
          "ps_supplycost")
    },

    // ---- TPC-H Q21: suppliers who solely caused a problem -----------------
    // The multi-semi-anti self-join: a flagged lineitem qualifies when
    // ANOTHER supplier shipped in the same order (EXISTS → left-semi)
    // but NO other supplier's line in that order was flagged
    // (NOT EXISTS → left-anti). All three lineitem legs and the orders
    // filter join on l_orderkey, so one orderkey exchange serves the
    // semi, the anti, and the orders join; supplier/nation/region
    // broadcast. ORDER BY numwait DESC, s_name is a total order
    // (s_name unique), so the LIMIT is deterministic.
    QDef("q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA'
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100
        |""".stripMargin) { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val l1 = li.filter(col("l_returnflag") === "R")
      val others = li.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val othersFlagged = l1.select(col("l_orderkey").as("y_orderkey"),
        col("l_suppkey").as("y_suppkey"))
      val supAsia = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .join(broadcast(table(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      l1
        .join(table(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(others,
          col("x_orderkey") === col("l_orderkey") &&
            col("x_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(othersFlagged,
          col("y_orderkey") === col("l_orderkey") &&
            col("y_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(supAsia), col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }
  )
}
