package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** TPC-H Q2/Q21 shapes vs independent in-memory derivations. */
class Coverage9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

  // region/nation keys are int32 in the corpus; supplier/part keys int64
  private def lng(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue

  private def regionNations(rName: String): Set[Long] = {
    val regions = graft.table(spark, sfDir, "region").collect()
      .map(r => lng(r, 0) -> r.getString(1)).toMap
    graft.table(spark, sfDir, "nation").collect()
      .filter(r => regions(lng(r, 2)) == rName).map(lng(_, 0)).toSet
  }

  test("q_tpch_q2 equals the local min-cost-supplier derivation") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ps = li.groupBy(x => (x._1, x._2)).view
      .mapValues(_.map(_._3).min).toMap
    val euNations = regionNations("EUROPE")
    val sup = graft.table(spark, sfDir, "supplier").collect()
      .map(r => lng(r, 0) -> (r.getString(1), lng(r, 2), r.getDouble(3)))
      .toMap
    val euOffers = ps.filter { case ((_, sk), _) =>
      euNations.contains(sup(sk)._2)
    }
    val minCost = euOffers.groupBy(_._1._1).view
      .mapValues(_.values.min).toMap
    val parts = graft.table(spark, sfDir, "part")
      .select("p_partkey", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val expected = euOffers.collect {
      case ((pk, sk), cost)
        if parts.get(pk).exists(p => p._2 <= 15 && p._1 == "STANDARD") &&
          cost == minCost(pk) =>
        (sup(sk)._1, pk, cost)
    }.toSet
    val got = q("q_tpch_q2").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getDouble(5))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "filter must select something at sf0.001")
  }

  test("q_tpch_q21 equals the local sole-flagged-supplier derivation") {
    val li = graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val fOrders = graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus").collect()
      .filter(_.getString(1) == "F").map(_.getLong(0)).toSet
    val byOrder = li.groupBy(_._1)
    val asiaNations = regionNations("ASIA")
    val sup = graft.table(spark, sfDir, "supplier").collect()
      .map(r => lng(r, 0) -> (r.getString(1), lng(r, 2))).toMap
    val waiting = li.filter { case (ok, sk, flag) =>
      flag == "R" && fOrders.contains(ok) &&
        asiaNations.contains(sup(sk)._2) &&
        byOrder(ok).exists(_._2 != sk) &&
        !byOrder(ok).exists(l => l._2 != sk && l._3 == "R")
    }
    val expected = waiting.groupBy(x => sup(x._2)._1).view
      .mapValues(_.length.toLong).toMap
    val got = q("q_tpch_q21").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toMap === expected)
    assert(got.nonEmpty, "at least one sole-flagged supplier at sf0.001")
    // the ORDER BY is a total order: numwait desc, then name
    assert(got.sortBy(x => (-x._2, x._1)).sameElements(got))
  }
}
